"""Structured Streaming operators over the events stream.

The reference has no true streaming semantics (SURVEY.md §2.9 — its only
incremental construct is batched iteration), so these operators EXTEND the
engine for continuous ingest: late-data-tolerant windowed aggregation and
stateful sessionization, both expressed so the same code runs on a file
stream (tests drive it with the parquet events table + memory sink) or any
production source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream (one parquet dir; production would swap the
    source format — the plan downstream is identical).
    ``max_files_per_trigger`` splits a multi-file directory into genuine
    micro-batches (state/ordering tests)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding window counts + value sums per event_type with a
    watermark for late data."""
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("sum_v1000"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "sum_v1000",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (built-in session_window: state handled by
    Spark, gap-based close)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id", "n_events",
        )
    )


STATE_SCHEMA = "n bigint, sum_v double, ewma double"
USER_STATS_SCHEMA = (
    "user_id bigint, n bigint, sum_v double, ewma double, batch_rows bigint"
)


def stateful_user_stats(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``:
    per-user running (count, sum, EWMA-of-value) maintained in Spark group
    state across micro-batches — the arbitrary-state surface that windowed
    and session aggregation (above) cannot express, because the EWMA
    recurrence e_k = a*v_k + (1-a)*e_{k-1} depends on every prior event.

    Each trigger emits one UPDATE row per user seen in that batch with the
    state AFTER folding the batch in (deterministic within-batch order:
    ts, then event_id — the group's Arrow chunks are CONCATENATED before
    the one global sort, because a large group arrives as several chunks in
    arbitrary order).  NULL values count toward ``n`` but are excluded from
    sum/EWMA (a single NaN would otherwise poison the state forever).
    State is a 3-tuple, bounded per user — executor memory holds
    O(distinct users), never O(events)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    a = float(alpha)

    def update(key, pdfs, state):
        import pandas as pd

        n, s, e = state.get if state.exists else (0, 0.0, None)
        parts = list(pdfs)
        pdf = (
            pd.concat(parts, ignore_index=True).sort_values(["ts", "event_id"])
            if parts
            else pd.DataFrame(columns=["value"])
        )
        batch_rows = len(pdf)
        n += batch_rows
        vals = pdf["value"].dropna().astype(float)
        if len(vals):
            s += float(vals.sum())
            # ewm(adjust=False) computes exactly e_k = a*v_k + (1-a)*e_{k-1};
            # seeding with the carried state folds across batches bit-exactly
            seq = (
                vals.reset_index(drop=True)
                if e is None
                else pd.concat([pd.Series([e]), vals], ignore_index=True)
            )
            e = float(seq.ewm(alpha=a, adjust=False).mean().iloc[-1])
        state.update((int(n), float(s), None if e is None else float(e)))
        yield pd.DataFrame(
            [{
                "user_id": key[0], "n": int(n), "sum_v": float(s),
                "ewma": e, "batch_rows": int(batch_rows),
            }]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append") -> None:
    """Drive a streaming query to completion on the available files
    (synchronous smoke path: memory sink + processAllAvailable).
    ``mode="update"`` for stateful operators like ``stateful_user_stats``
    (Update-mode output is not supported under an Append sink)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
