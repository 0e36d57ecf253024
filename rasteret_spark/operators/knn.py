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


def _ring_cells(
    df: DataFrame, x: str, y: str, res: int, k: int, out: str = "cell", inner: int = 0
) -> DataFrame:
    """Explode each probe into the cells with Chebyshev distance in
    ``[inner, k]`` — native sequence/explode (lon wrap, lat clamp), no UDF.

    ``inner > 0`` yields only the NEW shell between two expansion rounds, so
    round r never re-scans the (2k+1)^2 disk already examined by round r-1.
    Caller must keep 2k+1 <= n to avoid wrap-around duplicate cells."""
    n = _n(res)
    ix = F.floor((F.col(x) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    iy = F.floor((F.col(y) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1))
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1))
    df = df.withColumn("_cix", ix).withColumn("_ciy", iy)
    df = df.withColumn("_dx", F.explode(F.sequence(F.lit(-k), F.lit(k))))
    df = df.withColumn("_dy", F.explode(F.sequence(F.lit(-k), F.lit(k))))
    if inner > 0:
        df = df.filter(F.greatest(F.abs(F.col("_dx")), F.abs(F.col("_dy"))) >= inner)
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
    stats: dict | None = None,
) -> DataFrame:
    """Exact kNN via iterative k-ring expansion at cell resolution ``res``.

    Scale discipline (each round is bounded, nothing re-executes):

      * round 1 joins the start-ring disk; every later round joins ONLY the
        new ring shell (``_ring_cells(inner=prev+1)``) — the already-scanned
        disk is never re-joined;
      * the per-round frontier (pending probes) and their accumulated top-k
        candidates are ``localCheckpoint``-ed, truncating lineage so the
        per-round driver decision (a count) and the final action never
        re-execute earlier rounds' joins;
      * the expansion is capped at ``min(max_ring, n/4)`` rings (wrap-safe:
        2k+1 <= n always holds) — stragglers past the cap fall back to the
        brute-force join, which for a handful of far-from-everything probes
        is the cheaper plan anyway.

    A probe is certified when it has k candidates and its k-th distance fits
    inside the ring's guaranteed-coverage radius ``ring * cell_h``.
    ``stats`` (optional dict) receives {"rounds": int, "bruteforced": int}.
    """
    n = _n(res)
    cell_h = 180.0 / n  # guaranteed coverage radius unit (smaller extent)
    ring_cap = max(1, n // 4) if max_ring is None else min(max_ring, max(1, n // 4))

    t_cells = targets.select(target_id, tx, ty).withColumn(
        "cell", cell_of_point_col(F.col(tx), F.col(ty), res)
    )
    t_cells = t_cells.persist()

    pending = probes.select(probe_id, px, py).localCheckpoint(eager=False)
    pending_topk = None  # accumulated candidates of still-pending probes
    done_parts: list[DataFrame] = []
    ring, prev_ring, rounds, n_brute = start_ring, 0, 0, 0
    while True:
        rounds += 1
        shell = _ring_cells(
            pending, px, py, res, ring, inner=(prev_ring + 1 if prev_ring else 0)
        )
        new_cand = (
            shell.join(t_cells, "cell")
            .drop("cell")
            .withColumn("dist2", _dist2(px, py, tx, ty))
        )
        cand = new_cand if pending_topk is None else pending_topk.unionByName(new_cand)
        w = Window.partitionBy(probe_id).orderBy(F.col("dist2").asc(), F.col(target_id).asc())
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .localCheckpoint()  # eager: one materialization per round
        )
        guaranteed = (ring * cell_h) ** 2
        agg = topk.groupBy(probe_id).agg(
            F.count("*").alias("_cnt"), F.max("dist2").alias("_maxd")
        )
        done_ids = agg.filter((F.col("_cnt") >= k) & (F.col("_maxd") <= guaranteed)).select(
            probe_id
        )
        # both splits read the checkpointed topk — no join re-execution
        done_parts.append(
            topk.join(F.broadcast(done_ids), probe_id, "left_semi").select(
                probe_id, target_id, "dist2", "rank"
            )
        )
        pending = pending.join(F.broadcast(done_ids), probe_id, "left_anti").localCheckpoint()
        if pending.isEmpty():
            break
        pending_topk = topk.join(F.broadcast(done_ids), probe_id, "left_anti").drop("rank")
        prev_ring, ring = ring, ring * 2
        if ring > ring_cap:
            rest = knn_bruteforce(pending, targets, k, probe_id, target_id, px, py, tx, ty)
            n_brute = 1
            done_parts.append(rest.select(probe_id, target_id, "dist2", "rank"))
            break
    t_cells.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
        stats["bruteforced"] = n_brute
    results = done_parts[0]
    for part in done_parts[1:]:
        results = results.unionByName(part)
    return results.select(probe_id, target_id, "dist2", "rank")
