"""As-of / latest-per-key selection — metadata-only winner dedup.

Spark form of rasteret's ``match="latest"`` path
(`src/rasteret/core/point_sampling.py:350-514`): pick the newest record per
key using metadata ONLY, **before** any pixel decode, so the expensive UDF
stage runs on winners alone.  Catalyst will not reorder across an opaque UDF,
so authoring this stage first is the plan-shape guarantee the reference gets
from its phase ordering.

Both operators are pure built-in window/join plans — no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "datetime",
    tie_break: str | None = None,
) -> DataFrame:
    """Keep the newest row per key (deterministic tie-break for run-to-run
    stable output — the explicit-ordering requirement called out in
    SURVEY.md §7 'hard parts')."""
    order = [F.col(order_col).desc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    right_cols: Sequence[str] | None = None,
    left_id: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward) or earliest with ``>=`` (forward),
    per ``key``.  Implemented as equi-join on key + range predicate + window
    dedup over the left row identity — shuffles once on ``key``; AQE picks
    broadcast when the right side is small."""
    if left_id is None:
        left = left.withColumn("_lid", F.monotonically_increasing_id())
        left_id = "_lid"
    rsel = right.select(
        F.col(key).alias("_rkey"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(c) for c in (right_cols or [c for c in right.columns if c not in (key,)])],
    )
    cond = (F.col(key) == F.col("_rkey")) & (
        (F.col("_rts") <= F.col(left_ts))
        if direction == "backward"
        else (F.col("_rts") >= F.col(left_ts))
    )
    j = left.join(rsel, cond, "left")
    order = F.col("_rts").desc() if direction == "backward" else F.col("_rts").asc()
    w = Window.partitionBy(F.col(left_id)).orderBy(order)
    out = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    drop = ["_rn", "_rkey", "_rts"] + (["_lid"] if left_id == "_lid" else [])
    return out.drop(*drop)
