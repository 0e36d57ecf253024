"""Skew handling: hot-key detection, salted two-phase aggregation, and
adaptive cell splitting for the spatial join.

Dense metro-area cells hold a huge share of rows (the synthetic generator
plants this skew deliberately).  Three tools, composable:

  * ``hot_keys`` — cheap pre-count of key occupancy (the driver-side decision
    input; at 10^12 rows run it on a sample);
  * ``salted_agg`` — two-phase groupBy for skewed aggregations: partial agg on
    (key, salt), final merge on key.  Catalyst's map-side combine already
    handles count/sum; this pattern is for list/set collection where one hot
    key would otherwise hydrate a single reducer;
  * ``point_in_bbox_join_adaptive`` — the cell-split join: cells whose point
    occupancy exceeds a threshold are re-covered one resolution finer on the
    image side, and points inside hot cells probe with their finer cell.
    Covers stay spatially disjoint per resolution, so each (point, image)
    pair still matches exactly once — no dedup shuffle.  This is the
    'adaptive cell-level split' of the north rule; the salted join in
    ``spatial_join.bbox_join`` is the blunter alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark.operators.spatial_join import (
    cell_of_point_col,
    explode_cover,
    pack_cell,
)


def hot_keys(df: DataFrame, key: str, threshold: int) -> list:
    """Keys whose row count exceeds ``threshold`` (collected; small by
    construction — a handful of hot cells)."""
    return [
        r[key]
        for r in df.groupBy(key).count().filter(F.col("count") > threshold).collect()
    ]


def salted_agg(
    df: DataFrame, key: str, agg_col: str, salts: int = 16
) -> DataFrame:
    """Two-phase collect_list: partial on (key, salt), merge on key.
    Bounds any single reducer's input to ~1/salts of the hot key's rows."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(agg_col).cast("string")), F.lit(salts)))
        .groupBy(key, "_salt")
        .agg(F.collect_list(agg_col).alias("_partial"))
    )
    return (
        partial.groupBy(key)
        .agg(F.flatten(F.collect_list("_partial")).alias(f"{agg_col}_list"))
    )


def point_in_bbox_join_adaptive(
    points: DataFrame,
    images: DataFrame,
    res: int = 7,
    hot_threshold: int = 5000,
    x: str = "x",
    y: str = "y",
    img_prefix: str = "img",
) -> DataFrame:
    """Point-in-bbox candidate join with per-cell adaptive resolution.

    1. count point occupancy per cell at ``res``; cells above
       ``hot_threshold`` are 'hot' (driver collects the small hot set);
    2. image covers: cold cells stay at ``res``; a cover cell that is hot is
       replaced by its (bbox-overlapping) children at ``res+1``;
    3. points probe with their ``res`` cell, or the ``res+1`` cell when
       inside a hot cell; exact bbox containment filter last.

    Exactly the same pair set as ``point_in_bbox_join`` (asserted in tests),
    but the hottest join key now fans out over 4x finer buckets.
    """
    pc = points.withColumn("cell_r", cell_of_point_col(F.col(x), F.col(y), res))
    hot = set(hot_keys(pc, "cell_r", hot_threshold))

    ic = explode_cover(
        images, f"{img_prefix}_xmin", f"{img_prefix}_ymin",
        f"{img_prefix}_xmax", f"{img_prefix}_ymax", res, "cell",
    )
    if hot:
        hot_lit = [F.lit(h) for h in hot]
        cold = ic.filter(~F.col("cell").isin(*hot_lit))
        # split each hot cover cell into its res+1 children that overlap the
        # image bbox (child bounds are pure arithmetic on the packed id)
        n1 = 1 << (res + 1)
        hot_side = (
            ic.filter(F.col("cell").isin(*hot_lit))
            .withColumn("_dx", F.explode(F.array(F.lit(0), F.lit(1))))
            .withColumn("_dy", F.explode(F.array(F.lit(0), F.lit(1))))
            .withColumn(
                "_cix",
                (
                    F.shiftright(F.col("cell"), 26).bitwiseAND(F.lit((1 << 26) - 1))
                ) * 2 + F.col("_dx"),
            )
            .withColumn(
                "_ciy", (F.col("cell").bitwiseAND(F.lit((1 << 26) - 1))) * 2 + F.col("_dy")
            )
        )
        # child cell bounds in degrees
        cw, ch = 360.0 / n1, 180.0 / n1
        cx0 = F.col("_cix") * cw - 180.0
        cy0 = F.col("_ciy") * ch - 90.0
        hot_side = hot_side.filter(
            (cx0 <= F.col(f"{img_prefix}_xmax"))
            & (cx0 + cw >= F.col(f"{img_prefix}_xmin"))
            & (cy0 <= F.col(f"{img_prefix}_ymax"))
            & (cy0 + ch >= F.col(f"{img_prefix}_ymin"))
        )
        # tighten: a child must still contain SOME of the image bbox — the
        # overlap filter above is exact for axis-aligned boxes
        hot_side = hot_side.withColumn(
            "cell", pack_cell(res + 1, F.col("_cix"), F.col("_ciy"))
        ).drop("_dx", "_dy", "_cix", "_ciy")
        ic = cold.unionByName(hot_side)
        pc = pc.withColumn(
            "cell",
            F.when(
                F.col("cell_r").isin(*hot_lit),
                cell_of_point_col(F.col(x), F.col(y), res + 1),
            ).otherwise(F.col("cell_r")),
        ).drop("cell_r")
    else:
        pc = pc.withColumnRenamed("cell_r", "cell")

    j = pc.join(ic, "cell", "inner")
    j = j.filter(
        (F.col(x) >= F.col(f"{img_prefix}_xmin"))
        & (F.col(x) <= F.col(f"{img_prefix}_xmax"))
        & (F.col(y) >= F.col(f"{img_prefix}_ymin"))
        & (F.col(y) <= F.col(f"{img_prefix}_ymax"))
    )
    return j.drop("cell")
