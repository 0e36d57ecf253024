"""Point sampling: staged DataFrame plan with per-image tile-dedup decode.

Spark re-expression of rasteret's 4-phase point sampler
(`src/rasteret/core/raster_accessor.py:340-1046` + planning helpers
`src/rasteret/core/point_sample_helpers.py:59-249`):

  phase 1 (plan)   — the candidate join (points x images) is done upstream by
                     ``spatial_join.point_in_bbox_join`` over LIGHT columns
                     (no blobs in the cell-join shuffle);
  phase 2 (group)  — candidates collapse to one row per image
                     (``collect_list`` of point structs), then join the image
                     ``bytes`` so each blob moves through at most one shuffle;
  phase 3 (lookup) — inside ``mapInPandas``: inverse-affine all points at
                     once, decode each touched tile ONCE via a per-image
                     CachedReader (A9 tile dedup), gather values, flag nodata;
  phase 4 (ring)   — nodata points fall back to an expanding Chebyshev ring
                     search for the nearest valid pixel (exact center-distance
                     scoring, deterministic (d², row, col) tie-break), bounded
                     by ``max_ring`` — the J5 kNN-flavoured ring search.  The
                     ring scan is VECTORIZED across points: per radius k, ALL
                     still-unresolved points gather their ring pixels at once
                     through the shared tile cache (no per-point window loop).

Error containment (R12): a corrupt blob yields per-point quarantine rows with
a ``status`` column instead of failing the task — mirroring the reference's
per-record failure collection (`src/rasteret/core/execution.py:274-297`,
`core/raster_accessor.py:1183-1313`).  Healthy rows carry ``status='ok'``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark import crs
from rasteret_spark.format import miniraster as mr

SAMPLES_SCHEMA = (
    "point_index bigint, image_id string, band int, px_col int, px_row int, "
    "in_bounds boolean, value double, valid boolean, ring_steps int, "
    "sample_col int, sample_row int, status string"
)
NEIGHBORHOOD_COL = ", neighborhood array<double>"


def _gather_pixels(
    reader: mr.CachedReader, band: int, rr: np.ndarray, cc: np.ndarray
) -> np.ndarray:
    """Vectorized pixel gather: decode each touched tile once (shared cache),
    fancy-index all requested (row, col) pairs.  Coords must be in-raster."""
    meta = reader.meta
    out = np.empty(rr.shape, dtype=np.float64)
    tids = (rr // meta.tile_h) * meta.tiles_x + (cc // meta.tile_w)
    for tid in np.unique(tids):
        sel = tids == tid
        ty, tx = divmod(int(tid), meta.tiles_x)
        tile = reader._tile(meta.tile_index(band, ty, tx))
        out[sel] = tile[rr[sel] % meta.tile_h, cc[sel] % meta.tile_w]
    return out


def _ring_offsets(k: int) -> np.ndarray:
    """(m, 2) row/col offsets of the Chebyshev ring at radius k (8k pixels)."""
    side = np.arange(-k, k + 1)
    top = np.stack([np.full(2 * k + 1, -k), side], axis=1)
    bot = np.stack([np.full(2 * k + 1, k), side], axis=1)
    mid = side[1:-1]
    lef = np.stack([mid, np.full(2 * k - 1, -k)], axis=1)
    rig = np.stack([mid, np.full(2 * k - 1, k)], axis=1)
    return np.concatenate([top, bot, lef, rig]).astype(np.int64)


def _ring_fallback(
    reader: mr.CachedReader,
    band: int,
    max_ring: int,
    need: np.ndarray,  # bool mask over points: in-bounds AND nodata-invalid
    rows: np.ndarray,
    cols: np.ndarray,
    frows: np.ndarray,
    fcols: np.ndarray,
):
    """Vectorized expanding-ring nearest-valid-pixel search.

    Per radius k all active points gather their 8k ring pixels in ONE pass
    (tile-deduped), the per-point (d², row, col)-lexicographic best is kept
    as a running candidate, and a point retires once its best is certified
    (d² <= (k-0.5)² — a strictly closer pixel can still appear one ring out).
    Returns (best_r, best_c, best_v) arrays (-1 / NaN where unresolved) —
    bit-identical to the per-point scan it replaces.
    """
    meta = reader.meta
    n = len(rows)
    best_d2 = np.full(n, np.inf)
    best_r = np.full(n, -1, dtype=np.int64)
    best_c = np.full(n, -1, dtype=np.int64)
    best_v = np.full(n, np.nan)
    active = need.copy()
    nod = meta.nodata
    for k in range(1, max_ring + 1):
        idx = np.nonzero(active)[0]
        if not len(idx):
            break
        offs = _ring_offsets(k)
        rr = rows[idx][:, None] + offs[None, :, 0]  # (p, m)
        cc = cols[idx][:, None] + offs[None, :, 1]
        inside = (rr >= 0) & (rr < meta.height) & (cc >= 0) & (cc < meta.width)
        vals = np.full(rr.shape, np.nan)
        if inside.any():
            vals[inside] = _gather_pixels(reader, band, rr[inside], cc[inside])
        ok = inside & (
            ~np.isnan(vals) if np.isnan(nod) else (vals != nod)
        ) & ~np.isnan(vals)
        d2 = (rr + 0.5 - frows[idx][:, None]) ** 2 + (cc + 0.5 - fcols[idx][:, None]) ** 2
        d2 = np.where(ok, d2, np.inf)
        # per-point lexicographic min over the ring by (d2, row, col):
        # sort rows of each point by the tuple, take the first per point
        p, m = d2.shape
        pidx = np.repeat(np.arange(p), m)
        order = np.lexsort((cc.ravel(), rr.ravel(), d2.ravel(), pidx))
        first = order[np.searchsorted(pidx[order], np.arange(p))]
        cand_d2, cand_r, cand_c, cand_v = (
            d2.ravel()[first], rr.ravel()[first], cc.ravel()[first], vals.ravel()[first]
        )
        has = np.isfinite(cand_d2)
        better = has & (
            (cand_d2 < best_d2[idx])
            | ((cand_d2 == best_d2[idx]) & (cand_r < best_r[idx]))
            | ((cand_d2 == best_d2[idx]) & (cand_r == best_r[idx]) & (cand_c < best_c[idx]))
        )
        upd = idx[better]
        best_d2[upd] = cand_d2[better]
        best_r[upd] = cand_r[better]
        best_c[upd] = cand_c[better]
        best_v[upd] = cand_v[better]
        # certification: retire points whose best cannot be beaten further out
        active[idx[best_d2[idx] <= (k - 0.5) ** 2]] = False
    return best_r, best_c, best_v


def _neighborhood_windows(
    reader: mr.CachedReader,
    band: int,
    neighborhood: int,
    in_bounds: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
) -> np.ndarray:
    """Edge-clamped n x n windows for all in-bounds points, gathered in one
    vectorized pass (the reference's neighbourhood_values,
    `src/rasteret/types.py:36-40`; clamped offsets
    `core/point_sample_helpers.py:158-229`), row-major flattened."""
    meta = reader.meta
    n = len(rows)
    half = neighborhood // 2
    wh = min(neighborhood, meta.height)
    ww = min(neighborhood, meta.width)
    nb_arr = np.empty(n, dtype=object)
    idx = np.nonzero(in_bounds)[0]
    if len(idx):
        rr0 = np.clip(rows[idx] - half, 0, meta.height - 1)
        cc0 = np.clip(cols[idx] - half, 0, meta.width - 1)
        rr0 = np.minimum(rr0, max(meta.height - neighborhood, 0))
        cc0 = np.minimum(cc0, max(meta.width - neighborhood, 0))
        rr = (rr0[:, None] + np.arange(wh))[:, :, None]  # (p, wh, 1)
        cc = (cc0[:, None] + np.arange(ww))[:, None, :]  # (p, 1, ww)
        rr, cc = np.broadcast_arrays(rr, cc)
        vals = _gather_pixels(reader, band, rr.reshape(-1), cc.reshape(-1)).reshape(
            len(idx), wh * ww
        )
        # C-speed list materialization: ndarray.tolist() converts the whole
        # row at once (vs a Python float() per pixel — this is the hot loop
        # of every neighborhood query)
        rows_as_lists = vals.astype(np.float64).tolist()
        for j, i in enumerate(idx):
            nb_arr[i] = rows_as_lists[j]
    for i in np.nonzero(~in_bounds)[0]:
        nb_arr[i] = None
    return nb_arr


def _sample_image(
    image_id, reader: mr.CachedReader, pts, max_ring: int,
    bands: tuple[int, ...] = (0,), neighborhood: int = 0,
) -> dict:
    meta = reader.meta
    a, _, c, _, e, f = meta.transform
    xs, ys = crs.from_lonlat(
        meta.epsg,
        np.asarray([p["x"] for p in pts], dtype=float),
        np.asarray([p["y"] for p in pts], dtype=float),
    )
    fcols = (xs - c) / a
    frows = (ys - f) / e
    cols = np.floor(fcols).astype(np.int64)
    rows = np.floor(frows).astype(np.int64)
    in_bounds = (cols >= 0) & (cols < meta.width) & (rows >= 0) & (rows < meta.height)

    n = len(pts)
    img_bands = [b for b in bands if b < meta.n_bands]
    parts: dict[str, list] = {k: [] for k in (
        "point_index", "image_id", "band", "px_col", "px_row", "in_bounds",
        "value", "valid", "ring_steps", "sample_col", "sample_row", "status",
    )}
    if neighborhood > 0:
        parts["neighborhood"] = []

    pidx = np.asarray([p["point_index"] for p in pts], dtype=np.int64)
    for band in img_bands:
        value = np.full(n, np.nan)
        valid = np.zeros(n, dtype=bool)
        ring_steps = np.zeros(n, dtype=np.int32)
        s_col = np.where(in_bounds, cols, -1).astype(np.int64)
        s_row = np.where(in_bounds, rows, -1).astype(np.int64)

        # phase 3 vectorized: gather all in-bounds point values in one pass
        # (each touched tile decodes once — A9 tile dedup)
        if in_bounds.any():
            value[in_bounds] = _gather_pixels(
                reader, band, rows[in_bounds], cols[in_bounds]
            )
        if meta.nodata is None:
            valid[in_bounds] = True
        else:
            valid[in_bounds] = value[in_bounds] != meta.nodata

        if max_ring > 0 and meta.nodata is not None:
            need = in_bounds & ~valid
            if need.any():
                br, bc, bv = _ring_fallback(
                    reader, band, max_ring, need, rows, cols, frows, fcols
                )
                hit = need & (br >= 0)
                value[hit] = bv[hit]
                valid[hit] = True
                ring_steps[hit] = np.maximum(
                    np.abs(br[hit] - rows[hit]), np.abs(bc[hit] - cols[hit])
                ).astype(np.int32)
                s_row[hit], s_col[hit] = br[hit], bc[hit]

        parts["point_index"].append(pidx)
        parts["image_id"].append(np.full(n, image_id, dtype=object))
        parts["band"].append(np.full(n, band, dtype=np.int32))
        parts["px_col"].append(cols.astype(np.int32))
        parts["px_row"].append(rows.astype(np.int32))
        parts["in_bounds"].append(in_bounds)
        parts["value"].append(value)  # NaN -> null via pandas
        parts["valid"].append(valid)
        parts["ring_steps"].append(ring_steps)
        parts["sample_col"].append(s_col.astype(np.int32))
        parts["sample_row"].append(s_row.astype(np.int32))
        parts["status"].append(np.full(n, "ok", dtype=object))
        if neighborhood > 0:
            parts["neighborhood"].append(
                _neighborhood_windows(reader, band, neighborhood, in_bounds, rows, cols)
            )

    return {k: np.concatenate(v) if v else np.array([]) for k, v in parts.items()}


def _quarantine_rows(image_id, pts, msg: str, neighborhood: int) -> dict:
    """Per-point status rows for an image whose blob failed to decode."""
    n = len(pts)
    out = {
        "point_index": np.asarray([p["point_index"] for p in pts], dtype=np.int64),
        "image_id": np.full(n, image_id, dtype=object),
        "band": np.full(n, -1, dtype=np.int32),
        "px_col": np.full(n, -1, dtype=np.int32),
        "px_row": np.full(n, -1, dtype=np.int32),
        "in_bounds": np.zeros(n, dtype=bool),
        "value": np.full(n, np.nan),
        "valid": np.zeros(n, dtype=bool),
        "ring_steps": np.zeros(n, dtype=np.int32),
        "sample_col": np.full(n, -1, dtype=np.int32),
        "sample_row": np.full(n, -1, dtype=np.int32),
        "status": np.full(n, msg, dtype=object),
    }
    if neighborhood > 0:
        nb = np.empty(n, dtype=object)
        nb[:] = None
        out["neighborhood"] = nb
    return out


def sample_points(
    candidates: DataFrame,
    images: DataFrame,
    max_ring: int = 0,
    parallelism: int | None = None,
    broadcast_points: bool | None = None,
    bands: tuple[int, ...] | list[int] | None = None,
    neighborhood: int = 0,
) -> DataFrame:
    """``candidates``: light output of ``point_in_bbox_join``
    (point_index, x, y, image_id — NO bytes).  ``images``: (image_id, bytes).
    Returns SAMPLES_SCHEMA rows, one per candidate pair per requested band
    (bands missing from an image are skipped).  ``neighborhood=n`` (odd n)
    appends an n x n edge-clamped window per in-bounds sample as an
    ``array<double>`` column.  A corrupt blob yields one quarantine row per
    candidate point (status column) instead of failing the stage."""
    from rasteret_spark.operators.decode import (
        _decode_parallelism,
        _err_status,
        grouped_side_choice,
    )

    want_bands = tuple(bands) if bands is not None else (0,)
    # remote mode (href column, no bytes): windows read through ranged
    # fetches, mirroring zonal_stats — snapshot the reader registry at
    # build so driver-registered schemes reach executors
    has_bytes = "bytes" in images.columns
    payload_col = "bytes" if has_bytes else "href"
    if payload_col not in images.columns:
        raise ValueError("images needs a 'bytes' or 'href' column")
    ranged_readers = None
    if not has_bytes:
        from rasteret_spark.sources.fetch import _RANGED_READERS

        ranged_readers = dict(_RANGED_READERS)
    agg = candidates.groupBy("image_id").agg(
        F.collect_list(F.struct("point_index", "x", "y")).alias("_pts")
    )
    agg, use_broadcast = grouped_side_choice(agg, broadcast_points, "_pts")
    if use_broadcast:
        # grouped probe side is small next to the blobs (size-guarded):
        # broadcast it so the sampling stage fuses with the image scan (no
        # blob shuffle); above the pair bound: shuffle join on image_id
        src = images.select("image_id", payload_col).join(F.broadcast(agg), "image_id")
    else:
        src = images.select("image_id", payload_col).join(agg, "image_id")
        src = src.repartition(_decode_parallelism(src, parallelism), "image_id")

    schema = SAMPLES_SCHEMA + (NEIGHBORHOOD_COL if neighborhood > 0 else "")
    col_names = [f.strip().split(" ")[0] for f in schema.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts: list[dict] = []
            for image_id, blob, pts in zip(pdf["image_id"], pdf[payload_col], pdf["_pts"]):
                try:
                    if not has_bytes:  # href -> lazy ranged-fetch facade
                        from rasteret_spark.sources.fetch import RangedBlob

                        blob = RangedBlob(str(blob), ranged_readers)
                    else:
                        blob = bytes(blob)
                    reader = mr.CachedReader(blob)
                    parts.append(
                        _sample_image(image_id, reader, pts, max_ring, want_bands, neighborhood)
                    )
                except Exception as e:  # quarantine rows, not a task failure
                    parts.append(
                        _quarantine_rows(image_id, pts, _err_status(e), neighborhood)
                    )
            parts = [p for p in parts if len(p["point_index"])]
            if parts:
                out = pd.DataFrame(
                    {c: np.concatenate([p[c] for p in parts]) for c in col_names}
                )
                out["value"] = out["value"].where(np.isfinite(out["value"]), None)
                yield out
            else:
                yield pd.DataFrame({c: [] for c in col_names})

    return src.mapInPandas(run, schema=schema)


def point_time_series(
    samples: DataFrame,
    image_times: DataFrame,
    time_col: str = "datetime",
) -> DataFrame:
    """Per-point temporal drill: fold SAMPLES_SCHEMA rows into one row per
    (point, band) with the full observation series ordered by time — the
    time-series-analysis primitive (the reference's per-point sampling
    returns flat rows, `src/rasteret/core/point_sampling.py:350-514`;
    analysis over them happens client-side there).

    ``image_times``: (image_id, <time_col>) — the light columns of the
    records table; joined by image_id (auto-broadcast under AQE when
    small).  Only valid in-bounds samples enter the series.  Output:
    ``series array<struct<t, image_id, value>>`` (chronological,
    image_id tie-break) + n_obs / first / last / mean summary columns,
    all pure Catalyst."""
    valid = samples.filter(F.col("valid") & F.col("in_bounds")).select(
        "point_index", "band", "image_id", "value"
    )
    joined = valid.join(
        image_times.select("image_id", F.col(time_col).alias("_t")), "image_id"
    )
    series = F.array_sort(
        F.collect_list(F.struct(F.col("_t").alias("t"), "image_id", "value"))
    )
    return (
        joined.groupBy("point_index", "band")
        .agg(series.alias("series"))
        .select(
            "point_index",
            "band",
            F.size("series").alias("n_obs"),
            F.element_at("series", 1)["t"].alias("t_first"),
            F.element_at("series", -1)["t"].alias("t_last"),
            F.aggregate(
                "series", F.lit(0.0), lambda acc, s: acc + s["value"]
            ).alias("_sum"),
            "series",
        )
        .withColumn("v_mean", F.col("_sum") / F.col("n_obs"))
        .drop("_sum")
    )
