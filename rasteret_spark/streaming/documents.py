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


def migrate_legacy_seen_store(
    spark: SparkSession, seen_dir: str, n_buckets: int = DEFAULT_SEEN_BUCKETS
) -> None:
    """One-time upgrade of a pre-bucketing (flat, content_hash-only) store
    to the bucketed layout.  Without this, legacy rows would read
    ``_bucket=null``, the bucket-pruning filter would drop them, and every
    previously-seen document would silently re-emit as a duplicate — and the
    first bucketed append would leave a mixed-depth directory that breaks
    partition discovery.  Called automatically at batch start; two-phase
    write + Hadoop FS swap like ``compact_seen_store``."""
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
    fs, p, jvm = _hadoop_fs(spark, seen_dir)
    fs.delete(p, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp_dir), p)


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

    if _has_legacy_flat_files(spark, seen_dir):
        migrate_legacy_seen_store(spark, seen_dir, n_buckets=n_buckets)
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
    fs, p, jvm = _hadoop_fs(spark, seen_dir)
    fs.delete(p, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp_dir), p)
    return int(n)
