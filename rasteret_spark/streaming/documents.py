"""Structured Streaming over the documents table: continuous training-data
ingest with cross-batch exact dedup and inline text analysis.

The reference has no streaming (SURVEY.md §2.9); this extends the engine's
LLM-pipeline side the same way ``streaming/events.py`` / ``images.py``
extend events/rasters.  Dedup state is DURABLE AND DISK-BOUND, not
in-memory Spark state: every micro-batch anti-joins against a parquet
seen-hash store and appends its new hashes — so a restart resumes from the
store and state never lives in executor memory.

Scale discipline for the store (the pattern that holds at 10^12 documents):
hashes are written BUCKETED by ``pmod(content_hash, n_buckets)`` as a
partition column, and each micro-batch filters the store read to the buckets
its own hashes land in — the anti-join scans only matching buckets (a
partition filter on the scan, plan-asserted in tests), not the whole store.
``compact_seen_store`` rewrites the append-only layout into one distinct
file per bucket offline.  Store probing goes through ``spark.read`` with an
explicit schema (never a driver-local ``os.listdir``), so the same code runs
against HDFS/S3A paths where local directory listings are meaningless.

Winner semantics: FIRST ARRIVAL wins across batches (within one batch, the
lowest doc_id — deterministic).  Batch ``dedup.exact_dedup`` keeps the
lowest id globally; the parity test pins set-equality of surviving content
hashes, which both rules guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

from rasteret_spark.operators.text import lang_id, quality_score, token_count

# hash-bucket count for the seen store.  MUST stay constant for the lifetime
# of a given seen_dir (the bucket is derived from the hash value; changing k
# re-homes hashes and breaks pruning).  64 buckets keep per-bucket files
# coarse enough to stay scan-friendly yet bound each batch's store scan to
# ~1/64 of the hashes per touched bucket after compaction.
DEFAULT_SEEN_BUCKETS = 64

SEEN_SCHEMA = "content_hash bigint, _bucket int"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_text_analysis(docs: DataFrame) -> DataFrame:
    """Stateless enrichment — identical expressions to the batch queries
    (q17/q18/q19), so stream == batch row-for-row."""
    return docs.select(
        "*",
        F.xxhash64(F.col("text")).alias("content_hash"),
        token_count(F.col("text")).alias("n_tokens"),
        lang_id(F.col("text")).alias("pred_lang"),
        quality_score(F.col("text")).alias("quality"),
    )


def streaming_exact_dedup(
    docs: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    n_buckets: int = DEFAULT_SEEN_BUCKETS,
):
    """Continuous exact dedup: first-arrival-wins across micro-batches.

    Returns the started StreamingQuery.  Each batch: enrich -> in-batch
    dedup (lowest doc_id per hash) -> anti-join the durable seen store
    (bucket-pruned) -> write survivors + their hashes.  Restart-safe because
    the OUTPUT write is idempotent: survivors land in a ``_batch=<id>``
    partition via dynamic partition overwrite, so when the checkpoint
    replays a crashed batch the partition is overwritten, not appended — a
    crash between the output write and the seen-store append cannot
    duplicate documents.  The seen store itself is append-only (duplicate
    hash rows there are harmless for an anti-join; ``compact_seen_store``
    offline).  ``n_buckets`` must stay constant per seen_dir.
    """
    spark = docs.sparkSession
    enriched = with_text_analysis(docs)

    def process(batch: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch, batch_id, out_dir, seen_dir, n_buckets=n_buckets)

    return (
        enriched.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p, jvm


def _has_legacy_flat_files(spark: SparkSession, seen_dir: str) -> bool:
    """True when the store predates bucketing: parquet files sit directly at
    the root instead of under ``_bucket=`` partitions.  Hadoop FS listing —
    portable, metadata-only."""
    fs, p, _ = _hadoop_fs(spark, seen_dir)
    if not fs.exists(p):
        return False
    return any(
        not st.isDirectory() and st.getPath().getName().endswith(".parquet")
        for st in fs.listStatus(p)
    )


def _swap_into_place(spark: SparkSession, seen_dir: str, tmp_dir: str) -> None:
    """Crash-safe store swap: aside-rename the live store, promote the fully
    written tmp dir, then drop the aside copy.  Unlike delete-then-rename,
    a crash at ANY step leaves a complete copy of the hashes on disk under a
    deterministic sibling path that ``recover_seen_store`` repairs — never a
    window where the only surviving data is an orphan the reader ignores
    (which would silently re-emit every previously-seen document)."""
    fs, p, jvm = _hadoop_fs(spark, seen_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    old = hpath(seen_dir.rstrip("/") + ".old")
    if fs.exists(old):  # stale aside from an already-recovered crash
        fs.delete(old, True)
    if fs.exists(p):
        fs.rename(p, old)
    fs.rename(hpath(tmp_dir), p)
    if fs.exists(old):
        fs.delete(old, True)


def recover_seen_store(spark: SparkSession, seen_dir: str) -> str | None:
    """Detect and repair an interrupted ``_swap_into_place`` (or a partial
    migrate/compact rewrite).  Safe to call any time the store is quiescent;
    runs automatically before the first micro-batch touches a store.

    Cases (tmp is ``<seen_dir>.migrate`` or ``<seen_dir>.compact``):
      * live store missing + tmp COMPLETE (has ``_SUCCESS``): the crash hit
        between aside-rename and promote -> promote tmp, drop ``.old``;
      * live store present (or tmp partial): tmp is dead weight from an
        interrupted rewrite -> drop it (the next migrate/compact rebuilds it
        from the live store);
      * live store missing + only ``.old`` remains: restore the aside copy;
      * stale ``.old`` beside a live store: drop it.
    Returns a short description of the action taken, or None."""
    fs, p, jvm = _hadoop_fs(spark, seen_dir)
    hpath = jvm.org.apache.hadoop.fs.Path
    old = hpath(seen_dir.rstrip("/") + ".old")
    for suffix in (".migrate", ".compact"):
        tmp = hpath(seen_dir.rstrip("/") + suffix)
        if not fs.exists(tmp):
            continue
        complete = fs.exists(hpath(str(tmp) + "/_SUCCESS"))
        if complete and not fs.exists(p):
            fs.rename(tmp, p)
            if fs.exists(old):
                fs.delete(old, True)
            return f"promoted complete {suffix} dir"
        fs.delete(tmp, True)
        return f"dropped {'stale' if complete else 'partial'} {suffix} dir"
    if fs.exists(old):
        if not fs.exists(p):
            fs.rename(old, p)
            return "restored .old aside copy"
        fs.delete(old, True)
        return "dropped stale .old aside copy"
    return None


# seen_dirs already recovered + legacy-checked by THIS driver process: the
# crash-recovery probe and the legacy-layout listing are once-per-store
# concerns, not per-micro-batch ones (at 1 s triggers against S3A the
# per-batch listStatus is a needless RPC).  Keyed by the store path; tests
# reset via ``_STORE_READY.clear()``.
_STORE_READY: set[str] = set()


def ensure_store_ready(
    spark: SparkSession, seen_dir: str, n_buckets: int = DEFAULT_SEEN_BUCKETS
) -> None:
    """Once per (driver process, seen_dir): recover any interrupted swap,
    then migrate a pre-bucketing flat layout.  Subsequent calls are a set
    lookup."""
    if seen_dir in _STORE_READY:
        return
    recover_seen_store(spark, seen_dir)
    if _has_legacy_flat_files(spark, seen_dir):
        migrate_legacy_seen_store(spark, seen_dir, n_buckets=n_buckets)
    _STORE_READY.add(seen_dir)


def migrate_legacy_seen_store(
    spark: SparkSession, seen_dir: str, n_buckets: int = DEFAULT_SEEN_BUCKETS
) -> None:
    """One-time upgrade of a pre-bucketing (flat, content_hash-only) store
    to the bucketed layout.  Without this, legacy rows would read
    ``_bucket=null``, the bucket-pruning filter would drop them, and every
    previously-seen document would silently re-emit as a duplicate — and the
    first bucketed append would leave a mixed-depth directory that breaks
    partition discovery.  Called automatically at batch start; two-phase
    write + crash-safe ``_swap_into_place`` (recoverable at every step via
    ``recover_seen_store``)."""
    flat = spark.read.schema("content_hash bigint").parquet(seen_dir)
    bucketed = flat.withColumn(
        "_bucket", F.pmod(F.col("content_hash"), F.lit(int(n_buckets))).cast("int")
    ).distinct()
    tmp_dir = seen_dir.rstrip("/") + ".migrate"
    (
        bucketed.repartition(int(n_buckets), "_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(tmp_dir)
    )
    _swap_into_place(spark, seen_dir, tmp_dir)


def read_seen_store(spark: SparkSession, seen_dir: str) -> DataFrame:
    """The seen store as a DataFrame — empty (not an error) when the store
    does not exist yet.  Portable: probes through ``spark.read`` with the
    explicit store schema, so it behaves identically on local FS, HDFS and
    object stores (no driver-side ``os.listdir``, which is wrong under
    eventual consistency and meaningless for non-file URIs)."""
    try:
        # explicit schema: an existing-but-empty directory reads as 0 rows
        # instead of failing schema inference
        return spark.read.schema(SEEN_SCHEMA).parquet(seen_dir)
    except Exception as e:  # path-not-found AnalysisException -> empty store
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], SEEN_SCHEMA)
        raise


def survivors_against_seen(
    spark: SparkSession,
    first: DataFrame,
    seen_dir: str,
    n_buckets: int = DEFAULT_SEEN_BUCKETS,
) -> DataFrame:
    """In-batch-deduped rows -> rows whose hash is NOT in the seen store,
    with the store scan PRUNED to the buckets the batch actually touches.

    The batch's distinct bucket ids (<= n_buckets ints) are collected and
    pushed into the store read as an ``isin`` partition filter — the
    anti-join reads only matching ``_bucket=`` directories, so per-batch
    store I/O is bounded by batch spread, not store size.  Returns the
    survivors WITH their ``_bucket`` column (callers append it to the
    store)."""
    first = first.withColumn(
        "_bucket", F.pmod(F.col("content_hash"), F.lit(int(n_buckets))).cast("int")
    )
    buckets = [
        int(r[0]) for r in first.select("_bucket").distinct().collect()
    ]  # bounded by n_buckets — a driver pull by design
    if not buckets:
        return first
    seen = read_seen_store(spark, seen_dir).filter(F.col("_bucket").isin(buckets))
    # equi-join on (bucket, hash): same hash -> same bucket, so semantics
    # equal a hash-only join, and the bucket key keeps the shuffle aligned
    # with the store's physical layout
    return first.join(seen, ["_bucket", "content_hash"], "left_anti")


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    seen_dir: str,
    n_buckets: int = DEFAULT_SEEN_BUCKETS,
) -> None:
    """One micro-batch of the dedup sink (exposed for direct testing of the
    replay semantics).  Idempotent in batch_id: re-running the same batch
    overwrites its own output partition and only re-appends hashes."""
    from pyspark.sql import Window

    ensure_store_ready(spark, seen_dir, n_buckets=n_buckets)
    w = Window.partitionBy("content_hash").orderBy(F.col("doc_id").asc())
    # persist the in-batch-deduped rows BEFORE the bucket-id collect inside
    # survivors_against_seen — otherwise the enrich + window pipeline runs
    # twice per micro-batch (once for the collect, once for the writes)
    deduped = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    try:
        first = survivors_against_seen(spark, deduped, seen_dir, n_buckets=n_buckets)
        first = first.withColumn("_batch", F.lit(int(batch_id))).persist()
        try:
            (
                first.drop("_bucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch")
                .parquet(out_dir)
            )
            (
                first.select("content_hash", "_bucket")
                .write.mode("append")
                .partitionBy("_bucket")
                .parquet(seen_dir)
            )
        finally:
            first.unpersist()
    finally:
        deduped.unpersist()


def compact_seen_store(
    spark: SparkSession, seen_dir: str, n_buckets: int = DEFAULT_SEEN_BUCKETS
) -> int:
    """Offline compaction: rewrite the append-only store as one distinct
    hash set per bucket (run while the stream is stopped).  Dedups the
    harmless-but-wasteful duplicate hash rows replays appended and coalesces
    the per-batch small files.  Returns the distinct hash count.

    Two-phase: write the compacted layout to a sibling ``<seen_dir>.compact``
    path, then swap via the Hadoop FileSystem API (portable across local FS,
    HDFS, S3A — no driver-local file ops).  The swap window is not atomic on
    object stores; that is acceptable for an offline maintenance helper."""
    recover_seen_store(spark, seen_dir)  # offline helper: always re-probe
    if _has_legacy_flat_files(spark, seen_dir):  # pre-bucketing layout
        migrate_legacy_seen_store(spark, seen_dir, n_buckets=n_buckets)
    compacted = (
        spark.read.schema(SEEN_SCHEMA)
        .parquet(seen_dir)
        # defensive re-derivation: a null _bucket row (hand-copied data)
        # must land in its true bucket, never __HIVE_DEFAULT_PARTITION__
        .withColumn(
            "_bucket",
            F.coalesce(
                F.col("_bucket"),
                F.pmod(F.col("content_hash"), F.lit(int(n_buckets))).cast("int"),
            ),
        )
        .distinct()
    )
    tmp_dir = seen_dir.rstrip("/") + ".compact"
    (
        compacted.repartition(int(n_buckets), "_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(tmp_dir)
    )
    n = spark.read.schema(SEEN_SCHEMA).parquet(tmp_dir).count()
    _swap_into_place(spark, seen_dir, tmp_dir)
    return int(n)


def seen_store_stats(
    spark: SparkSession, seen_dir: str, exact: bool = False
) -> dict:
    """Operational stats for a seen store, cheap enough to poll: row counts
    come from parquet FOOTER metadata (a count() with no filter never scans
    data pages), file counts/bytes from one recursive Hadoop FS listing.
    Operators use the per-bucket ``files`` counts to schedule
    ``compact_seen_store`` (append-only streams accrete one small file per
    touched bucket per micro-batch).

    Returns ``{"exists", "n_rows", "n_buckets", "buckets": {bucket: {"rows",
    "files", "bytes"}}, "legacy_flat", "n_distinct"?}``; ``n_distinct`` (and
    the rows-minus-distinct compaction headroom it implies) only when
    ``exact=True`` — that one is a real aggregation over the store."""
    fs, p, _ = _hadoop_fs(spark, seen_dir)
    if not fs.exists(p):
        return {"exists": False, "n_rows": 0, "n_buckets": 0, "buckets": {},
                "legacy_flat": False}
    buckets: dict[int, dict] = {}
    legacy = False
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("_bucket="):
            b = int(name.split("=", 1)[1])
            files = nbytes = 0
            for f in fs.listStatus(st.getPath()):
                if f.getPath().getName().endswith(".parquet"):
                    files += 1
                    nbytes += int(f.getLen())
            buckets[b] = {"files": files, "bytes": nbytes}
        elif not st.isDirectory() and name.endswith(".parquet"):
            legacy = True
    per_bucket_rows = {
        int(r["_bucket"]): int(r["n"])
        for r in (
            spark.read.schema(SEEN_SCHEMA)
            .parquet(seen_dir)
            .groupBy("_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if r["_bucket"] is not None
    }
    for b, rows in per_bucket_rows.items():
        buckets.setdefault(b, {"files": 0, "bytes": 0})["rows"] = rows
    for b in buckets:
        buckets[b].setdefault("rows", 0)
    out = {
        "exists": True,
        "n_rows": sum(per_bucket_rows.values()),
        "n_buckets": len(buckets),
        "buckets": buckets,
        "legacy_flat": legacy,
    }
    if exact:
        out["n_distinct"] = int(
            spark.read.schema(SEEN_SCHEMA)
            .parquet(seen_dir)
            .select("content_hash")
            .distinct()
            .count()
        )
    return out
