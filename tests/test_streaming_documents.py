"""Streaming document ingest: cross-batch exact dedup parity vs the batch
operator, durable seen-store resume, and stateless analysis parity."""

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark.operators import dedup
from rasteret_spark.streaming import documents as sd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_batches(spark, tmp_path_factory):
    """The sf0.001 documents split into 3 arrival batches, with dups planted
    ACROSS batches (same text, new doc_ids) so cross-batch state is exercised."""
    src = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    base_max = int(src["doc_id"].max())
    third = len(src) // 3
    b0 = src.iloc[:third]
    b1 = src.iloc[third : 2 * third].copy()
    b2 = src.iloc[2 * third :].copy()
    # batch 1 re-sends 5 batch-0 texts under new ids; batch 2 re-sends 3
    for i, (bi, n_dup) in enumerate([(b1, 5), (b2, 3)], start=1):
        dups = b0.iloc[: n_dup].copy()
        dups["doc_id"] = [base_max + 100 * i + j for j in range(n_dup)]
        bi_rows = pd.concat([bi, dups], ignore_index=True)
        if i == 1:
            b1 = bi_rows
        else:
            b2 = bi_rows
    d = tmp_path_factory.mktemp("docs_stream")
    full = pd.concat([b0, b1, b2], ignore_index=True)
    for i, b in enumerate([b0, b1, b2]):
        spark.createDataFrame(b).coalesce(1).write.mode("overwrite").parquet(
            str(d / f"arrival={i}")
        )
    stream_dir = tmp_path_factory.mktemp("arrivals")
    import os
    import time

    now = time.time()
    for i in range(3):
        src_part = next((d / f"arrival={i}").glob("*.parquet"))
        dst = stream_dir / f"batch-{i}.parquet"
        shutil.copy(src_part, dst)
        # the file source processes oldest-modtime first — pin arrival order
        os.utime(dst, (now + 10 * i, now + 10 * i))
    return str(stream_dir), full


def test_streaming_dedup_matches_batch_hash_set(spark, docs_batches, tmp_path):
    stream_dir, full_pdf = docs_batches
    out, seen, ck = (str(tmp_path / n) for n in ("out", "seen", "ck"))
    s = sd.read_documents_stream(spark, stream_dir, max_files_per_trigger=1)
    q = sd.streaming_exact_dedup(s, out, seen, ck)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out).toPandas()
    # one survivor per distinct text, hash set identical to the batch operator
    batch = dedup.exact_dedup(
        spark.createDataFrame(full_pdf), "text", "doc_id"
    ).withColumn("content_hash", F.xxhash64("text")).toPandas()
    assert len(got) == got["content_hash"].nunique()
    assert set(got["content_hash"]) == set(batch["content_hash"])
    assert len(got) == len(batch)
    # cross-batch dups (re-sent texts) must NOT survive twice: the planted
    # duplicates all carry doc_id > base ids and identical text to batch 0
    planted = full_pdf[full_pdf.duplicated("text", keep="first")]
    assert len(planted) >= 8
    surviving_planted = got[got["doc_id"].isin(planted["doc_id"])]
    assert len(surviving_planted) == 0, "first arrival must win across batches"
    # stateless analysis columns match the batch expressions
    want_cols = {"content_hash", "n_tokens", "pred_lang", "quality"}
    assert want_cols <= set(got.columns)


def test_streaming_dedup_resumes_from_seen_store(spark, docs_batches, tmp_path):
    """A second stream run over the SAME input with the seen store kept (new
    checkpoint = full replay) emits nothing new — the durable store, not
    Spark state, carries dedup across restarts."""
    stream_dir, _ = docs_batches
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    q = sd.streaming_exact_dedup(
        sd.read_documents_stream(spark, stream_dir), out, seen, str(tmp_path / "ck1")
    )
    q.processAllAvailable()
    q.stop()
    n_first = len(spark.read.parquet(out).toPandas())
    q2 = sd.streaming_exact_dedup(
        sd.read_documents_stream(spark, stream_dir), out, seen, str(tmp_path / "ck2")
    )
    q2.processAllAvailable()
    q2.stop()
    assert len(spark.read.parquet(out).toPandas()) == n_first


def test_process_batch_replay_is_idempotent(spark, tmp_path):
    """Crash-replay simulation: re-running the SAME micro-batch must not
    duplicate output documents — the batch output partition overwrites, and
    a batch whose hashes already reached the store emits nothing new."""
    from pyspark.sql import functions as F  # noqa: N812

    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    batch = sd.with_text_analysis(
        spark.createDataFrame(
            pd.DataFrame([
                {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s",
                 "n_chars": 10},
                {"doc_id": 2, "text": "alpha beta", "lang": "en", "source": "s",
                 "n_chars": 10},
                {"doc_id": 3, "text": "gamma delta", "lang": "en", "source": "s",
                 "n_chars": 11},
            ])
        )
    )
    import shutil as sh

    sd.process_batch(spark, batch, 0, out, seen)
    first = spark.read.parquet(out).toPandas()
    assert sorted(first["doc_id"]) == [1, 3]  # in-batch dedup, lowest id
    # replay after crash-BEFORE-seen-append: simulate by REMOVING the seen
    # store (it did not exist when the batch first ran) — the same survivors
    # recompute with non-empty data and the partition must OVERWRITE, not
    # append (this is the dynamic-partition-overwrite path under test)
    sh.rmtree(seen)
    sd.process_batch(spark, batch, 0, out, seen)
    again = spark.read.parquet(out).toPandas()
    assert sorted(again["doc_id"]) == [1, 3], "replay must overwrite, not append"
    assert len(again) == again["content_hash"].nunique()
    # replay after crash-AFTER-seen-append: anti-join drops everything, the
    # empty write touches no partitions, output unchanged
    sd.process_batch(spark, batch, 0, out, seen)
    assert sorted(spark.read.parquet(out).toPandas()["doc_id"]) == [1, 3]


def _mini_batch(spark, rows):
    return sd.with_text_analysis(
        spark.createDataFrame(
            pd.DataFrame(
                [
                    {"doc_id": i, "text": t, "lang": "en", "source": "s",
                     "n_chars": len(t)}
                    for i, t in rows
                ]
            )
        )
    )


def test_seen_store_is_bucketed_on_disk(spark, tmp_path):
    """Hashes land under _bucket=<pmod(hash, k)> partition directories."""
    import pathlib

    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    batch = _mini_batch(spark, [(1, "alpha"), (2, "beta"), (3, "gamma")])
    sd.process_batch(spark, batch, 0, out, seen, n_buckets=8)
    dirs = {p.name for p in pathlib.Path(seen).iterdir() if p.is_dir()}
    assert dirs and all(d.startswith("_bucket=") for d in dirs)
    store = spark.read.schema(sd.SEEN_SCHEMA).parquet(seen).toPandas()
    assert len(store) == 3
    assert (store["_bucket"] == store["content_hash"] % 8).all()


def test_anti_join_scan_prunes_to_batch_buckets(spark, tmp_path):
    """The per-batch store scan reads ONLY matching buckets: the seen-store
    scan in the survivors plan carries a _bucket partition filter."""
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    sd.process_batch(
        spark, _mini_batch(spark, [(1, "alpha"), (2, "beta")]), 0, out, seen,
        n_buckets=8,
    )
    first = _mini_batch(spark, [(9, "alpha"), (10, "zeta")])
    surv = sd.survivors_against_seen(spark, first, seen, n_buckets=8)
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    assert "_bucket" in seg and "IN" in seg.upper()
    got = surv.toPandas()
    assert sorted(got["doc_id"]) == [10], "seen hash dropped, new hash kept"


def test_read_seen_store_missing_and_empty_paths(spark, tmp_path):
    """Portable probe: a missing store reads as 0 rows (no os.listdir)."""
    assert sd.read_seen_store(spark, str(tmp_path / "nope")).count() == 0


def test_compact_seen_store_dedups_and_preserves_semantics(spark, tmp_path):
    """Replay-appended duplicate hashes compact away; dedup behavior across
    a compaction boundary is unchanged."""
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    batch = _mini_batch(spark, [(1, "alpha"), (2, "beta")])
    sd.process_batch(spark, batch, 0, out, seen, n_buckets=8)
    # simulate a replay that re-appended the same hashes (crash after the
    # output write, before the checkpoint commit, seen-store append re-ran)
    store = spark.read.schema(sd.SEEN_SCHEMA).parquet(seen)
    store.write.mode("append").partitionBy("_bucket").parquet(seen)
    assert spark.read.schema(sd.SEEN_SCHEMA).parquet(seen).count() == 4
    n = sd.compact_seen_store(spark, seen, n_buckets=8)
    assert n == 2
    compacted = spark.read.schema(sd.SEEN_SCHEMA).parquet(seen).toPandas()
    assert len(compacted) == 2
    assert (compacted["_bucket"] == compacted["content_hash"] % 8).all()
    # post-compaction: dedup still drops seen hashes, admits new ones
    nxt = _mini_batch(spark, [(5, "alpha"), (6, "delta")])
    sd.process_batch(spark, nxt, 1, out, seen, n_buckets=8)
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["doc_id"]) == [1, 2, 6]


def test_legacy_flat_seen_store_migrates_and_still_dedups(spark, tmp_path):
    """A pre-bucketing store (flat content_hash-only files at the root) must
    be migrated, not silently ignored: its hashes still dedup, and the
    layout becomes bucketed before any append (no mixed-depth wedge)."""
    import pathlib

    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    # simulate the old layout: root-level parquet with content_hash only
    legacy = spark.createDataFrame(
        [(int(r[0]),) for r in _mini_batch(spark, [(1, "alpha"), (2, "beta")])
         .select("content_hash").collect()],
        "content_hash bigint",
    )
    legacy.coalesce(1).write.mode("overwrite").parquet(seen)
    assert sd._has_legacy_flat_files(spark, seen)

    # new-code batch re-sends "alpha" (seen) plus a new doc
    sd.process_batch(spark, _mini_batch(spark, [(9, "alpha"), (10, "zeta")]),
                     0, out, seen, n_buckets=8)
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["doc_id"]) == [10], "legacy-seen hash must still dedup"
    # store is now fully bucketed (no root parquet files, no null buckets)
    assert not sd._has_legacy_flat_files(spark, seen)
    dirs = {p.name for p in pathlib.Path(seen).iterdir() if p.is_dir()}
    assert dirs and all(d.startswith("_bucket=") for d in dirs)
    store = spark.read.schema(sd.SEEN_SCHEMA).parquet(seen).toPandas()
    assert store["_bucket"].notna().all()
    assert (store["_bucket"] == store["content_hash"] % 8).all()


def test_interrupted_migration_swap_recovers(spark, tmp_path):
    """Crash between aside-rename and promote: the store exists only at
    <seen>.migrate (+ the .old aside).  recover_seen_store must promote the
    complete migrate dir — previously-seen hashes still dedup afterwards."""
    import os

    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    sd.process_batch(spark, _mini_batch(spark, [(1, "aa bb"), (2, "cc dd")]),
                     0, out, seen, n_buckets=8)
    # simulate the crash window of the OLD delete/rename protocol's fix:
    # a fully-written tmp dir beside an aside-renamed live store
    store = spark.read.schema(sd.SEEN_SCHEMA).parquet(seen)
    store.write.mode("overwrite").partitionBy("_bucket").parquet(seen + ".migrate")
    os.rename(seen, seen + ".old")
    assert not os.path.exists(seen)
    action = sd.recover_seen_store(spark, seen)
    assert action == "promoted complete .migrate dir"
    assert os.path.exists(seen) and not os.path.exists(seen + ".old")
    assert not os.path.exists(seen + ".migrate")
    # the recovered store still dedups: replaying the same texts emits nothing
    sd._STORE_READY.clear()
    sd.process_batch(spark, _mini_batch(spark, [(9, "aa bb"), (10, "cc dd")]),
                     1, out, seen, n_buckets=8)
    docs = spark.read.parquet(out).toPandas()
    assert sorted(docs["doc_id"]) == [1, 2]


def test_partial_migrate_dir_is_dropped_and_old_restored(spark, tmp_path):
    """A tmp dir without _SUCCESS is a partial write: recovery drops it and,
    when the live store is gone, restores the .old aside copy."""
    import os

    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    sd.process_batch(spark, _mini_batch(spark, [(1, "aa bb")]), 0, out, seen,
                     n_buckets=8)
    os.makedirs(seen + ".migrate")
    with open(seen + ".migrate/part-00000.parquet", "wb") as f:
        f.write(b"partial")  # no _SUCCESS marker
    assert sd.recover_seen_store(spark, seen) == "dropped partial .migrate dir"
    assert not os.path.exists(seen + ".migrate")
    os.rename(seen, seen + ".old")
    assert sd.recover_seen_store(spark, seen) == "restored .old aside copy"
    assert os.path.exists(seen)
    assert sd.recover_seen_store(spark, seen) is None  # clean store: no-op


def test_legacy_probe_runs_once_per_store(spark, tmp_path, monkeypatch):
    """The crash-recovery + legacy-layout probes are once-per-(process,
    store), not once-per-micro-batch (each is a metadata RPC against the
    store's filesystem at every trigger otherwise)."""
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    calls = {"n": 0}
    real = sd._has_legacy_flat_files

    def counting(spark_, seen_dir):
        calls["n"] += 1
        return real(spark_, seen_dir)

    monkeypatch.setattr(sd, "_has_legacy_flat_files", counting)
    sd._STORE_READY.clear()
    for i, text in enumerate(["aa", "bb", "cc"]):
        sd.process_batch(spark, _mini_batch(spark, [(i, text)]), i, out, seen,
                         n_buckets=8)
    assert calls["n"] == 1


def test_seen_store_stats(spark, tmp_path):
    out, seen = str(tmp_path / "out"), str(tmp_path / "seen")
    assert sd.seen_store_stats(spark, seen) == {
        "exists": False, "n_rows": 0, "n_buckets": 0, "buckets": {},
        "legacy_flat": False,
    }
    texts = [(i, f"text number {i}") for i in range(20)]
    sd.process_batch(spark, _mini_batch(spark, texts), 0, out, seen, n_buckets=4)
    # append a duplicate hash row (replayed append) for the exact count to dedup
    store = spark.read.schema(sd.SEEN_SCHEMA).parquet(seen)
    store.limit(1).write.mode("append").partitionBy("_bucket").parquet(seen)
    stats = sd.seen_store_stats(spark, seen, exact=True)
    assert stats["exists"] and not stats["legacy_flat"]
    assert stats["n_rows"] == 21 and stats["n_distinct"] == 20
    assert set(stats["buckets"]) <= {0, 1, 2, 3}
    assert sum(b["rows"] for b in stats["buckets"].values()) == 21
    assert all(b["files"] >= 1 and b["bytes"] > 0 for b in stats["buckets"].values())
