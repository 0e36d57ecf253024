"""kNN via k-ring cell expansion — with a brute-force oracle variant.

Distributed generalization of rasteret's bounded ring search
(`src/rasteret/core/raster_accessor.py:759-883`): probe points join targets
through expanding Chebyshev rings of grid cells, so each probe only ever
meets targets in nearby cells instead of the whole table.  The expansion is
driver-iterated (bounded doubling) but every round is one JVM-native
cell equi-join — no Python in the hot path; candidate scoring + top-k is a
window over (probe, distance).

Exactness rule: a probe's k-th neighbour found within ring radius ``k_ring``
is certified once its distance is <= (k_ring) * cell_size - eps … we use the
conservative form: candidates are accepted when the k-th best distance is
within the ring's guaranteed-coverage radius ``k_ring * cell_h`` (cell height
is the smaller cell extent); unresolved probes re-run with a doubled ring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark.operators.spatial_join import cell_of_point_col, pack_cell, _n


def _ring_cells(df: DataFrame, x: str, y: str, res: int, k: int, out: str = "cell") -> DataFrame:
    """Explode each probe into all cells within Chebyshev distance k —
    native sequence/explode (lon wrap, lat clamp), no UDF."""
    n = _n(res)
    ix = F.floor((F.col(x) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    iy = F.floor((F.col(y) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1))
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1))
    df = df.withColumn("_cix", ix).withColumn("_ciy", iy)
    df = df.withColumn("_dx", F.explode(F.sequence(F.lit(-k), F.lit(k))))
    df = df.withColumn("_dy", F.explode(F.sequence(F.lit(-k), F.lit(k))))
    df = df.withColumn("_ix", F.pmod(F.col("_cix") + F.col("_dx"), F.lit(n)))
    df = df.withColumn("_iy", F.col("_ciy") + F.col("_dy")).filter(
        (F.col("_iy") >= 0) & (F.col("_iy") < n)
    )
    return df.withColumn(out, pack_cell(res, F.col("_ix"), F.col("_iy"))).drop(
        "_cix", "_ciy", "_dx", "_dy", "_ix", "_iy"
    )


def _dist2(px: str, py: str, tx: str, ty: str) -> F.Column:
    dx = F.col(px) - F.col(tx)
    dy = F.col(py) - F.col(ty)
    return dx * dx + dy * dy


def knn_bruteforce(
    probes: DataFrame,
    targets: DataFrame,
    k: int,
    probe_id: str = "point_index",
    target_id: str = "target_id",
    px: str = "x",
    py: str = "y",
    tx: str = "tx",
    ty: str = "ty",
) -> DataFrame:
    """Exact kNN by cross join + window top-k (baseline / oracle path).
    Output: probe_id, target_id, dist2, rank."""
    j = probes.select(probe_id, px, py).crossJoin(targets.select(target_id, tx, ty))
    j = j.withColumn("dist2", _dist2(px, py, tx, ty))
    w = Window.partitionBy(probe_id).orderBy(F.col("dist2").asc(), F.col(target_id).asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, target_id, "dist2", "rank")
    )


def knn_cells(
    probes: DataFrame,
    targets: DataFrame,
    k: int,
    res: int = 6,
    start_ring: int = 1,
    max_ring: int | None = None,
    probe_id: str = "point_index",
    target_id: str = "target_id",
    px: str = "x",
    py: str = "y",
    tx: str = "tx",
    ty: str = "ty",
) -> DataFrame:
    """Exact kNN via iterative k-ring expansion at cell resolution ``res``.

    Each round: probes (only the unresolved ones) explode into their ring
    cells, equi-join targets indexed by cell, score, keep top-k; a probe is
    certified when its k-th distance fits inside the ring's guaranteed
    radius.  Rounds double the ring until all probes resolve or ``max_ring``
    spans the whole grid (falls back to brute force for stragglers).
    """
    n = _n(res)
    cell_h = 180.0 / n  # guaranteed coverage radius unit (smaller extent)
    if max_ring is None:
        max_ring = n  # whole grid

    t_cells = targets.select(target_id, tx, ty).withColumn(
        "cell", cell_of_point_col(F.col(tx), F.col(ty), res)
    )
    t_cells = t_cells.persist()

    unresolved = probes.select(probe_id, px, py)
    results = None
    ring = start_ring
    spark = probes.sparkSession
    while True:
        cand = _ring_cells(unresolved, px, py, res, ring).join(t_cells, "cell").drop("cell")
        cand = cand.withColumn("dist2", _dist2(px, py, tx, ty))
        w = Window.partitionBy(probe_id).orderBy(F.col("dist2").asc(), F.col(target_id).asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        guaranteed = (ring * cell_h) ** 2
        agg = topk.groupBy(probe_id).agg(
            F.count("*").alias("_cnt"), F.max("dist2").alias("_maxd")
        )
        done_ids = agg.filter((F.col("_cnt") >= k) & (F.col("_maxd") <= guaranteed)).select(
            probe_id
        )
        done = topk.join(F.broadcast(done_ids), probe_id, "left_semi")
        results = done if results is None else results.unionByName(done)
        unresolved = unresolved.join(F.broadcast(done_ids), probe_id, "left_anti")
        # materialize the small driver decision only (count), not the data
        if unresolved.isEmpty():
            break
        ring *= 2
        if ring > max_ring:
            rest = knn_bruteforce(unresolved, targets, k, probe_id, target_id, px, py, tx, ty)
            results = results.unionByName(rest)
            break
    t_cells.unpersist()
    return results.select(probe_id, target_id, "dist2", "rank")
