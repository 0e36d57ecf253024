"""Per-partition lineage + checkpointed, resumable stage execution.

The north rule requires every stage to write per-partition lineage/metrics to
a checkpoint log so a killed job resumes at partition granularity.  The
reference gets resumability from workspace caches (`src/rasteret/__init__.py:162`,
`core/collection.py:860-902`) — a single-process design this module replaces
with a Spark-native protocol:

  * rows are bucketed by a deterministic ``part_id`` (hash of a stable key);
  * stage output is written as parquet partitioned by ``part_id``, dynamic
    partition overwrite ON, so re-processing a partition is idempotent;
  * the checkpoint LOG (one row per completed partition: stage, part_id,
    rows_out, wall_s, completed_at) is itself a small parquet table; a
    partition counts as done only when its log row exists — the log row is
    written AFTER the data, so a kill between the two re-runs that partition;
  * resume = anti-join the input's part ids against the log.

Driver-visible metrics per stage land in the same log table.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

LOG_SCHEMA = "stage string, part_id int, rows_out bigint, wall_s double, completed_at string"


def _log_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_parts(spark: SparkSession, out_dir: str, stage: str) -> set[int]:
    path = _log_dir(out_dir)
    if not os.path.exists(path) or not os.listdir(path):
        return set()
    log = spark.read.schema(LOG_SCHEMA).json(path)
    return {
        r.part_id for r in log.filter(F.col("stage") == stage).select("part_id").collect()
    }


def read_log(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(LOG_SCHEMA).json(_log_dir(out_dir))


def checkpointed_run(
    spark: SparkSession,
    df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_dir: str,
    key_col: str,
    stage: str = "stage",
    n_parts: int = 32,
) -> DataFrame:
    """Run ``transform`` over ``df`` resumably.

    ``df`` is bucketed into ``n_parts`` by ``xxhash64(key_col)``; only
    buckets without a checkpoint-log row are processed.  Output parquet is
    partitioned by ``part_id`` with dynamic overwrite (idempotent re-runs).
    Returns the full stage output (read back from the checkpoint dir).
    """
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(_log_dir(out_dir), exist_ok=True)
    bucketed = df.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_parts)).cast("int")
    )
    done = completed_parts(spark, out_dir, stage)
    todo = bucketed.filter(~F.col("part_id").isin(list(done))) if done else bucketed

    if not todo.isEmpty():
        t0 = time.time()
        result = transform(todo)
        if "part_id" not in result.columns:
            raise ValueError("transform must preserve the part_id column")
        with_dyn = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            result.write.partitionBy("part_id").mode("overwrite").parquet(data_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", with_dyn)
        wall = time.time() - t0
        # log rows AFTER data is durably written (kill-safe ordering)
        counts = (
            spark.read.parquet(data_dir)
            .groupBy("part_id")
            .count()
            .collect()
        )
        now = time.strftime("%Y-%m-%dT%H:%M:%S")
        new_parts = {int(r.part_id) for r in counts} - done
        rows = [
            {
                "stage": stage,
                "part_id": int(r.part_id),
                "rows_out": int(r["count"]),
                "wall_s": round(wall, 3),
                "completed_at": now,
            }
            for r in counts
            if int(r.part_id) in new_parts
        ]
        fname = os.path.join(_log_dir(out_dir), f"{stage}-{int(time.time() * 1000)}.json")
        tmp = os.path.join(out_dir, f".{stage}.log.tmp")  # outside the log dir
        with open(tmp, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        os.replace(tmp, fname)  # atomic marker commit
    return spark.read.parquet(data_dir)
