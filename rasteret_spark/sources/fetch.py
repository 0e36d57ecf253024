"""Pluggable blob-fetch backends: scheme -> callable registry + a distributed
href-resolving stage.

Spark re-expression of the reference's StorageBackend protocol (rasteret
wires obstore/asyncio fetchers behind `src/rasteret/fetch/__init__.py` and
`core/collection.py`'s backend injection): the engine never hard-codes where
blobs live — a record table carries hrefs, and ``fetch_blobs`` resolves them
to a ``bytes`` column executor-side through whatever fetchers are registered
(file://, s3://, http://, in-memory test fakes, ...).

Scale + containment shape:

  * the fetch runs inside ``mapInPandas`` batches — per-executor connections,
    no driver I/O, and the registered callables ship to executors by closure
    capture at plan-build time (late registrations on the driver do not
    retroactively change a built plan);
  * per-row try/except: a missing object yields a quarantine row
    (``fetch_status`` column) instead of a task failure — same R12 policy as
    the decode kernels.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame


def _fetch_file(url: str) -> bytes:
    p = urlparse(url)
    with open(p.path, "rb") as f:
        return f.read()


_FETCHERS: dict[str, Callable[[str], bytes]] = {"file": _fetch_file}


def register_fetcher(scheme: str, fn: Callable[[str], bytes]) -> None:
    """Register/override the fetcher for a URL scheme (e.g. "s3", "http").
    The callable must be picklable (plain function or cloudpickle-able
    closure) — it executes on executors."""
    _FETCHERS[scheme.lower()] = fn


def fetch(url: str, fetchers: dict[str, Callable[[str], bytes]] | None = None) -> bytes:
    reg = _FETCHERS if fetchers is None else fetchers
    scheme = urlparse(url).scheme.lower() or "file"
    fn = reg.get(scheme)
    if fn is None:
        raise ValueError(f"no fetcher registered for scheme {scheme!r} ({url})")
    return fn(url)


def fetch_blobs(
    df: DataFrame,
    url_col: str = "href",
    out_col: str = "bytes",
    parallelism: int | None = None,
) -> DataFrame:
    """Resolve ``url_col`` hrefs to a binary ``out_col`` executor-side.

    All input columns pass through; adds ``out_col`` (binary, null on
    failure) and ``fetch_status`` (string, 'ok' or the error).  Repartitions
    by the url column so fetch work spreads across executors even when the
    upstream is a few big parquet row groups."""
    from rasteret_spark.operators.decode import _decode_parallelism, _err_status

    from pyspark.sql import types as T  # noqa: N812

    fetchers = dict(_FETCHERS)  # snapshot: travels to executors via closure
    # NEVER df.schema.add(...): StructType.add mutates in place and df.schema
    # is cached on the DataFrame — it would permanently grow the CALLER's
    # schema with phantom columns.  Build a fresh StructType instead.
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.BinaryType()), T.StructField("fetch_status", T.StringType())]
    )
    df = df.repartition(_decode_parallelism(df, parallelism), url_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, status = [], []
            for url in pdf[url_col]:
                try:
                    blobs.append(bytearray(fetch(str(url), fetchers)))
                    status.append("ok")
                except Exception as e:  # quarantine row, not a task failure
                    blobs.append(None)
                    status.append(_err_status(e))
            out = pdf.copy()
            out[out_col] = blobs
            out["fetch_status"] = status
            yield out

    return df.mapInPandas(run, schema=schema)
