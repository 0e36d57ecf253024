"""Materialized compacted cell covers — the stored spatial index column.

SURVEY.md Stage 2: footprints are encoded once into a compacted
mixed-resolution cell set (H3-compact semantics, `rasteret_spark.grid`) and
stored alongside the record, so later queries prune by pure equi-joins:

  * probe points generate their ancestor-chain cells (one per resolution)
    and match a compacted cover iff the point lies in any stored cell;
  * covers can be uncompacted to a fixed resolution for the canonical-cell
    join in ``spatial_join`` when uniform-res join keys are preferred.

The cover column is computed in one Arrow-batched UDF at ingest/enrichment
time (write-once, like the header cache) — query-time joins stay native.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark import grid


def with_compacted_cover(
    df: DataFrame,
    xmin: str = "xmin",
    ymin: str = "ymin",
    xmax: str = "xmax",
    ymax: str = "ymax",
    res: int = 9,
    out_col: str = "cells",
) -> DataFrame:
    """Add ``out_col: array<long>`` — the compacted cover of the bbox at base
    resolution ``res``."""

    @F.pandas_udf("array<long>")
    def _cover(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        out = []
        for x0, y0, x1, y1 in zip(a, b, c, d):
            cells = grid.cover_bbox(float(x0), float(y0), float(x1), float(y1), res)
            out.append([int(v) for v in grid.compact(cells)])
        return pd.Series(out)

    return df.withColumn(out_col, _cover(F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax)))


def point_probe_join(
    points: DataFrame,
    covered: DataFrame,
    res: int,
    min_res: int = 0,
    x: str = "x",
    y: str = "y",
    cells_col: str = "cells",
) -> DataFrame:
    """Join probe points against compacted covers: the point side explodes
    into its ancestor chain (res .. min_res, native expressions), the cover
    side explodes its stored cells; equi-join on the cell id.

    Each (point, record) pair matches at most once because a compacted cover
    contains at most one ancestor of any point cell (compaction removes
    covered descendants)."""
    from rasteret_spark.operators.spatial_join import cell_of_point_col

    chain = F.array(
        *[cell_of_point_col(F.col(x), F.col(y), r) for r in range(res, min_res - 1, -1)]
    )
    p = points.withColumn("cell", F.explode(chain))
    c = covered.withColumn("cell", F.explode(F.col(cells_col))).drop(cells_col)
    return p.join(c, "cell", "inner").drop("cell")
