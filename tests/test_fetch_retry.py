"""Retry/backoff in the pluggable fetch path — transient failures recover,
permanent failures fail fast, exhausted retries quarantine with the attempt
count (the reference's transport resilience,
`/root/reference/src/rasteret/fetch/cog.py:63-74, 499-657`)."""

import pandas as pd
import pytest

from rasteret_spark.sources import fetch as fx


# --- driver-side unit surface ----------------------------------------------------
def test_retry_recovers_after_transient_failures():
    calls = {"n": 0}
    slept = []

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise fx.TransientFetchError("503 slow down")
        return b"payload"

    blob, used = fx.fetch_with_retry(
        "mem://x", {"mem": flaky}, attempts=3, base_delay=0.1, sleep=slept.append
    )
    assert blob == b"payload" and used == 3
    assert len(slept) == 2  # backoff between attempts, none after success
    # exponential: second wait ~2x the first (both carry <=25% jitter)
    assert 0.1 <= slept[0] <= 0.125 and 0.2 <= slept[1] <= 0.25


def test_permanent_error_fails_fast_no_retry():
    calls = {"n": 0}

    def missing(url):
        calls["n"] += 1
        raise FileNotFoundError(url)

    with pytest.raises(FileNotFoundError):
        fx.fetch_with_retry("mem://x", {"mem": missing}, attempts=5, sleep=lambda s: None)
    assert calls["n"] == 1, "404-class errors must not burn retry budget"


def test_transient_exhaustion_raises_last_error():
    def always_down(url):
        raise ConnectionError("reset by peer")

    with pytest.raises(ConnectionError):
        fx.fetch_with_retry(
            "mem://x", {"mem": always_down}, attempts=3, sleep=lambda s: None
        )


def test_is_transient_classification():
    class FakeHTTPError(Exception):
        def __init__(self, code):
            self.code = code

    assert fx.is_transient(fx.TransientFetchError("x"))
    assert fx.is_transient(ConnectionResetError("x"))  # ConnectionError subclass
    assert fx.is_transient(TimeoutError("x"))
    assert fx.is_transient(FakeHTTPError(503))
    assert fx.is_transient(FakeHTTPError(429))
    assert not fx.is_transient(FakeHTTPError(404))
    assert not fx.is_transient(FileNotFoundError("x"))
    assert not fx.is_transient(ValueError("no fetcher registered"))


def test_backoff_is_deterministic_and_bounded():
    a = fx._backoff_s("s3://b/k", 2, 0.2)
    assert a == fx._backoff_s("s3://b/k", 2, 0.2)
    assert 0.8 <= a <= 1.0  # 0.2 * 2^2 * [1, 1.25]
    assert fx._backoff_s("s3://b/other", 2, 0.2) != a  # per-url decorrelation


# --- distributed surface ---------------------------------------------------------
def test_fetch_blobs_retries_flaky_and_quarantines_permanent(spark):
    """Flaky rows (2 transient failures then success) come back ok with the
    attempt count; permanently-down rows quarantine after N attempts; healthy
    rows are untouched — all in one mapInPandas pass."""
    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise fx.TransientFetchError("503")
        return b"recovered"

    def down(url):
        raise ConnectionError("reset")

    fx.register_fetcher("flaky", flaky)
    fx.register_fetcher("down", down)
    fx.register_fetcher("mem", lambda url: b"healthy")
    rows = [
        {"rid": "a", "href": "flaky://x"},
        {"rid": "b", "href": "down://x"},
        {"rid": "c", "href": "mem://x"},
        {"rid": "d", "href": "mem://missing-scheme-ok"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows)).coalesce(1)
    got = (
        fx.fetch_blobs(df, attempts=3, base_delay=0.001)
        .toPandas()
        .set_index("rid")
    )
    assert bytes(got.loc["a", "bytes"]) == b"recovered"
    assert got.loc["a", "fetch_status"] == "ok"
    assert got.loc["a", "fetch_attempts"] == 3
    assert got.loc["b", "bytes"] is None
    assert "after 3 attempts" in got.loc["b", "fetch_status"]
    assert got.loc["b", "fetch_attempts"] == 3
    assert got.loc["c", "fetch_status"] == "ok"
    assert got.loc["c", "fetch_attempts"] == 1


def test_fetch_blobs_permanent_error_single_attempt(spark):
    """A bad scheme / 404-class row quarantines with attempts=1 — retry
    budget is never spent on permanent errors."""
    df = spark.createDataFrame(
        pd.DataFrame([{"rid": "x", "href": "teapot://nope"}])
    )
    got = fx.fetch_blobs(df, attempts=5, base_delay=0.001).toPandas().iloc[0]
    assert "no fetcher registered" in got["fetch_status"]
    assert "after 1 attempts" in got["fetch_status"]
    assert got["fetch_attempts"] == 1


def test_attempt_count_true_when_transient_then_permanent():
    """ConnectionError on attempt 1, FileNotFoundError on attempt 2: the
    audit count must say 2 fetches ran, not 1."""
    calls = {"n": 0}

    def flaky_then_gone(url):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("reset")
        raise FileNotFoundError(url)

    with pytest.raises(FileNotFoundError) as ei:
        fx.fetch_with_retry(
            "mem://x", {"mem": flaky_then_gone}, attempts=5, sleep=lambda s: None
        )
    assert getattr(ei.value, "_fetch_attempts") == 2
    assert calls["n"] == 2


def test_http_408_is_transient():
    class FakeHTTPError(Exception):
        def __init__(self, code):
            self.code = code

    assert fx.is_transient(FakeHTTPError(408))
