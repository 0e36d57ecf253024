"""Cell-cover spatial joins: point-in-polygon and AOI x image overlap.

The Spark generalization of rasteret's bbox-prune + exact-refine join pattern
(bbox prefilter `src/rasteret/core/collection.py:225-239` + per-pair exact
evaluation `src/rasteret/core/execution.py:244-297`), redesigned for shuffle
efficiency at 10^12-row scale:

  1. Both sides are covered with quadtree cells at one fixed resolution,
     using NATIVE column expressions only (floor arithmetic + ``sequence`` +
     ``explode``) — the candidate generation never leaves the JVM, so
     Catalyst/AQE own the join strategy and whole-stage codegen applies.
  2. The cell equi-join produces each candidate pair once thanks to the
     canonical-cell rule: a pair is emitted only from the cell containing the
     top-left corner of the two bboxes' intersection.  No ``distinct`` /
     dedup shuffle is ever needed.
  3. Exact refinement: image footprints are axis-aligned rectangles in their
     (linear) CRS, so bbox tests are exact for them; arbitrary AOI polygons
     are refined with the vectorized ray-cast/rect-intersection kernels in a
     single Arrow-batched UDF — the only Python in the plan.

Skew: dense metro cells produce hot join keys.  ``salted`` mode appends a
deterministic salt to the cell key on the big (image) side and explodes the
probe side by all salts — bounded fan-out, even task sizes (AQE skew-join
handles residual imbalance).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812

RES_SHIFT = 52
IX_SHIFT = 26


def _n(res: int) -> int:
    return 1 << res


def pack_cell(res: int, ix: Column, iy: Column) -> Column:
    return (
        F.lit(res).cast("long") * F.lit(1 << RES_SHIFT).cast("long")
        + ix.cast("long") * F.lit(1 << IX_SHIFT).cast("long")
        + iy.cast("long")
    )


def cell_of_point_col(lon: Column, lat: Column, res: int) -> Column:
    """Native-expression cell id of a point (same math as grid.cell_of_point)."""
    n = _n(res)
    ix = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))), F.lit(0)),
        F.lit(n - 1),
    )
    iy = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))), F.lit(0)),
        F.lit(n - 1),
    )
    return pack_cell(res, ix, iy)


def _ix_col(x: Column, res: int, is_max: bool) -> Column:
    # NOTE: no epsilon shrink on the max edge.  The containment predicate is
    # closed (x <= xmax), so a point lying exactly on a cell boundary that is
    # also the bbox max edge must still find the cover cell containing it —
    # shrinking by eps dropped those matches.  Cost is at most one extra
    # candidate cell per axis; canonical-cell dedup and the exact refine
    # filter keep the output identical otherwise.
    n = _n(res)
    return F.least(
        F.greatest(F.floor((x + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))), F.lit(0)),
        F.lit(n - 1),
    )


def _iy_col(y: Column, res: int, is_max: bool) -> Column:
    n = _n(res)
    return F.least(
        F.greatest(F.floor((y + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))), F.lit(0)),
        F.lit(n - 1),
    )


def explode_cover(
    df: DataFrame,
    xmin: str,
    ymin: str,
    xmax: str,
    ymax: str,
    res: int,
    cell_name: str = "cell",
) -> DataFrame:
    """Explode a bbox into its covering cells at ``res`` — JVM-native
    (sequence x sequence), no UDF.  Adds ``cell_name`` column."""
    df = (
        df.withColumn("_ix0", _ix_col(F.col(xmin), res, False))
        .withColumn("_ix1", F.greatest(_ix_col(F.col(xmax), res, True), F.col("_ix0")))
        .withColumn("_iy0", _iy_col(F.col(ymin), res, False))
        .withColumn("_iy1", F.greatest(_iy_col(F.col(ymax), res, True), F.col("_iy0")))
    )
    df = df.withColumn("_ix", F.explode(F.sequence("_ix0", "_ix1"))).withColumn(
        "_iy", F.explode(F.sequence("_iy0", "_iy1"))
    )
    return df.withColumn(cell_name, pack_cell(res, F.col("_ix"), F.col("_iy"))).drop(
        "_ix0", "_ix1", "_iy0", "_iy1", "_ix", "_iy"
    )


def bbox_overlap(a: str, b: str) -> Column:
    """Exact bbox-overlap predicate on two bbox column prefixes
    (`{a}_xmin`...), same expression as rasteret `_bbox_overlap_expr`
    (`src/rasteret/core/collection.py:225-239`)."""
    return (
        (F.col(f"{a}_xmax") >= F.col(f"{b}_xmin"))
        & (F.col(f"{a}_xmin") <= F.col(f"{b}_xmax"))
        & (F.col(f"{a}_ymax") >= F.col(f"{b}_ymin"))
        & (F.col(f"{a}_ymin") <= F.col(f"{b}_ymax"))
    )


def bbox_join(
    images: DataFrame,
    aois: DataFrame,
    res: int = 7,
    img_prefix: str = "img",
    aoi_prefix: str = "aoi",
    salts: int = 0,
) -> DataFrame:
    """Candidate bbox-overlap join via cell equi-join, deduped by the
    canonical-cell rule (no distinct).  Inputs must carry
    ``{prefix}_xmin/_ymin/_xmax/_ymax`` columns; all other columns pass
    through.  ``salts > 0`` appends a salt to the image-side key and explodes
    the AOI side by every salt value (hot-cell skew mitigation).
    """
    ic = explode_cover(images, f"{img_prefix}_xmin", f"{img_prefix}_ymin",
                       f"{img_prefix}_xmax", f"{img_prefix}_ymax", res, "cell")
    ac = explode_cover(aois, f"{aoi_prefix}_xmin", f"{aoi_prefix}_ymin",
                       f"{aoi_prefix}_xmax", f"{aoi_prefix}_ymax", res, "cell")
    join_keys = ["cell"]
    if salts > 0:
        ic = ic.withColumn("salt", F.pmod(F.xxhash64(F.col("image_id")), F.lit(salts)))
        ac = ac.withColumn("salt", F.explode(F.array([F.lit(s) for s in range(salts)])))
        join_keys = ["cell", "salt"]
    j = ic.join(ac, join_keys, "inner")
    # canonical cell: the one containing the intersection's min corner
    inter_x = F.greatest(F.col(f"{img_prefix}_xmin"), F.col(f"{aoi_prefix}_xmin"))
    inter_y = F.greatest(F.col(f"{img_prefix}_ymin"), F.col(f"{aoi_prefix}_ymin"))
    j = j.filter(F.col("cell") == cell_of_point_col(inter_x, inter_y, res))
    j = j.filter(bbox_overlap(img_prefix, aoi_prefix))
    drop = ["cell"] + (["salt"] if salts > 0 else [])
    return j.drop(*drop)


def point_in_bbox_join(
    points: DataFrame,
    images: DataFrame,
    res: int = 7,
    x: str = "x",
    y: str = "y",
    img_prefix: str = "img",
    salts: int = 0,
) -> DataFrame:
    """points x images containment candidates: point cell equi-join against
    image cover cells + exact bbox containment (exact for rectangular
    footprints).  This is the distributed form of rasteret's candidate-point
    prefilter (`src/rasteret/core/point_sample_helpers.py:37-56`)."""
    ic = explode_cover(images, f"{img_prefix}_xmin", f"{img_prefix}_ymin",
                       f"{img_prefix}_xmax", f"{img_prefix}_ymax", res, "cell")
    pc = points.withColumn("cell", cell_of_point_col(F.col(x), F.col(y), res))
    join_keys = ["cell"]
    if salts > 0:
        ic = ic.withColumn("salt", F.explode(F.array([F.lit(s) for s in range(salts)])))
        pc = pc.withColumn("salt", F.pmod(F.xxhash64(F.col(x) + F.col(y)), F.lit(salts)))
        join_keys = ["cell", "salt"]
    j = pc.join(ic, join_keys, "inner")
    j = j.filter(
        (F.col(x) >= F.col(f"{img_prefix}_xmin"))
        & (F.col(x) <= F.col(f"{img_prefix}_xmax"))
        & (F.col(y) >= F.col(f"{img_prefix}_ymin"))
        & (F.col(y) <= F.col(f"{img_prefix}_ymax"))
    )
    drop = ["cell"] + (["salt"] if salts > 0 else [])
    return j.drop(*drop)


# --- exact polygon refine (the only Python stage) ------------------------------
def refine_rect_polygon(
    cands: DataFrame,
    rect_prefix: str = "img",
    poly_col: str = "aoi_geometry",
    out_col: str = "intersects",
    parallelism: int | None = None,
) -> DataFrame:
    """Exact rectangle x polygon refine for candidate pairs (Arrow-batched).

    Partitioning: the refine fuses into whatever stage produces the
    candidates (usually the cell join's scan/shuffle stage) — adding a
    dedicated exchange + python stage costs more in task-dispatch floor
    than the vectorized kernel itself (the whole 39k-row bench refine is
    68 ms single-core; a separate 32-task pandas stage costs ~1 s on this
    host).  Only an UNDER-SPLIT input (fewer partitions than cores — e.g.
    a one-split scan feeding a big explode) gets a conditional round-robin
    spread, same policy as ``util.spread_compute``."""
    from rasteret_spark import geom
    from rasteret_spark.operators.util import spread_compute

    if parallelism is not None:
        cands = cands.repartition(parallelism)
    else:
        cands = spread_compute(cands)

    import numpy as np

    @F.pandas_udf("boolean")
    def _refine(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series,
                wkb: pd.Series) -> pd.Series:
        # one vectorized pass per distinct polygon payload in the batch
        out = np.zeros(len(xmin), dtype=bool)
        groups: dict[bytes, list[int]] = {}
        for i, g in enumerate(wkb):
            groups.setdefault(bytes(g), []).append(i)
        a = xmin.to_numpy(float); b = ymin.to_numpy(float)
        c = xmax.to_numpy(float); d = ymax.to_numpy(float)
        for g, idxs in groups.items():
            ii = np.asarray(idxs)
            out[ii] = geom.rects_intersect_polygon(a[ii], b[ii], c[ii], d[ii], g)
        return pd.Series(out)

    return cands.withColumn(
        out_col,
        _refine(
            F.col(f"{rect_prefix}_xmin"), F.col(f"{rect_prefix}_ymin"),
            F.col(f"{rect_prefix}_xmax"), F.col(f"{rect_prefix}_ymax"),
            F.col(poly_col),
        ),
    )


def refine_point_in_polygon(
    cands: DataFrame, x: str = "x", y: str = "y", poly_col: str = "geometry",
    out_col: str = "inside",
) -> DataFrame:
    """Exact ray-cast PIP refine (vectorized per polygon group inside batches)."""
    from rasteret_spark import geom
    import numpy as np

    @F.pandas_udf("boolean")
    def _pip(px: pd.Series, py: pd.Series, wkb: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        # group rows by identical polygon payload -> one vectorized cast each
        groups: dict[bytes, list[int]] = {}
        for i, g in enumerate(wkb):
            groups.setdefault(bytes(g), []).append(i)
        pxv = px.to_numpy(dtype=float)
        pyv = py.to_numpy(dtype=float)
        for g, idxs in groups.items():
            ii = np.asarray(idxs)
            out[ii] = geom.points_in_polygon_wkb(pxv[ii], pyv[ii], g)
        return pd.Series(out)

    return cands.withColumn(out_col, _pip(F.col(x), F.col(y), F.col(poly_col)))
