"""Structured Streaming over the documents table: continuous training-data
ingest with cross-batch exact dedup and inline text analysis.

The reference has no streaming (SURVEY.md §2.9); this extends the engine's
LLM-pipeline side the same way ``streaming/events.py`` / ``images.py``
extend events/rasters.  Dedup state is DURABLE AND DISK-BOUND, not
in-memory Spark state: every micro-batch anti-joins against a parquet
seen-hash store and appends its new hashes — so a restart resumes from the
store, state never lives in executor memory, and the same pattern holds at
10^12 documents (the anti-join is a hash equi-join on a bigint column;
the store is partition-pruned parquet, compactable offline).

Winner semantics: FIRST ARRIVAL wins across batches (within one batch, the
lowest doc_id — deterministic).  Batch ``dedup.exact_dedup`` keeps the
lowest id globally; the parity test pins set-equality of surviving content
hashes, which both rules guarantee.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

from rasteret_spark.operators.text import lang_id, quality_score, token_count

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
):
    """Continuous exact dedup: first-arrival-wins across micro-batches.

    Returns the started StreamingQuery.  Each batch: enrich -> in-batch
    dedup (lowest doc_id per hash) -> anti-join the durable seen store ->
    write survivors + their hashes.  Restart-safe because the OUTPUT write
    is idempotent: survivors land in a ``_batch=<id>`` partition via dynamic
    partition overwrite, so when the checkpoint replays a crashed batch the
    partition is overwritten, not appended — a crash between the output
    write and the seen-store append cannot duplicate documents.  The seen
    store itself is append-only (duplicate hash rows there are harmless for
    an anti-join; compact offline).
    """
    spark = docs.sparkSession
    enriched = with_text_analysis(docs)

    def process(batch: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch, batch_id, out_dir, seen_dir)

    return (
        enriched.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def process_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, out_dir: str, seen_dir: str
) -> None:
    """One micro-batch of the dedup sink (exposed for direct testing of the
    replay semantics).  Idempotent in batch_id: re-running the same batch
    overwrites its own output partition and only re-appends hashes."""
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash").orderBy(F.col("doc_id").asc())
    first = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if os.path.isdir(seen_dir) and any(
        f.endswith(".parquet") for f in os.listdir(seen_dir)
    ):
        seen = spark.read.parquet(seen_dir)
        first = first.join(seen, "content_hash", "left_anti")
    first = first.withColumn("_batch", F.lit(int(batch_id))).persist()
    try:
        (
            first.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(out_dir)
        )
        first.select("content_hash").write.mode("append").parquet(seen_dir)
    finally:
        first.unpersist()
