"""Mosaic / first-valid-precedence reduction (A7/A8) and chip stacking (W3).

Spark re-expression of the reference's merge semantics:

  * first-valid mosaic — rasteret's TorchGeo chip path places records in
    query order and the first valid pixel wins
    (`src/rasteret/integrations/torchgeo.py:958-995`); the xarray path's
    ``combine_first`` fills NaN gaps by priority
    (`src/rasteret/core/execution.py:119-151`).  Both are order-dependent
    reduces, so the Spark form imposes an EXPLICIT deterministic ordering
    (datetime desc, image_id asc — SURVEY.md §7 'hard parts') and reduces
    with ``F.first(..., ignorenulls=True)`` over a window, or ``max_by``.
  * chip stacking — time-ordered per-chip sequences (``collect_list`` sorted
    by datetime), the `[T, C, H, W]` stacking order of
    `src/rasteret/integrations/torchgeo.py:1061-1130`.

These operate on SAMPLE/zonal outputs (value tables), keeping the reduce in
native Spark; pixel-level mosaics of full windows reuse the same pattern with
the decode UDF upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def first_valid_mosaic(
    samples: DataFrame,
    keys: Sequence[str] = ("point_index",),
    value_col: str = "value",
    valid_col: str = "valid",
    order_col: str = "datetime",
    tie_break: str = "image_id",
) -> DataFrame:
    """Per key, the value of the FIRST record (by explicit deterministic
    order: order_col desc, tie_break asc) whose pixel is valid.

    Input: one row per (key, image) candidate with value/valid columns plus
    the ordering columns.  Output: one row per key with ``mosaic_value`` and
    the winning image id."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(order_col).desc(), F.col(tie_break).asc()
    )
    ranked = samples.filter(F.col(valid_col)).withColumn("_rn", F.row_number().over(w))
    return (
        ranked.filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col(value_col).alias("mosaic_value"),
            F.col(tie_break).alias("winner_image_id"),
        )
    )


def chip_stack(
    samples: DataFrame,
    keys: Sequence[str] = ("point_index",),
    value_col: str = "value",
    order_col: str = "datetime",
    tie_break: str = "image_id",
) -> DataFrame:
    """Per key, the time-ordered sequence of values (T-axis stacking):
    ``array_sort`` on (order, tie, value) structs keeps ordering deterministic
    inside a single native aggregation (no window shuffle + no Python)."""
    return (
        samples.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("t"),
                                        F.col(tie_break).alias("tb"),
                                        F.col(value_col).alias("v")))
            ).alias("_s")
        )
        .select(
            *keys,
            F.transform(F.col("_s"), lambda s: s["v"]).alias("series"),
            F.size(F.col("_s")).alias("n_obs"),
        )
    )
