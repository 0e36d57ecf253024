"""Point sampling: staged DataFrame plan with per-image tile-dedup decode.

Spark re-expression of rasteret's 4-phase point sampler
(`src/rasteret/core/raster_accessor.py:340-1046` + planning helpers
`src/rasteret/core/point_sample_helpers.py:59-249`):

  phase 1 (plan)   — the candidate join (points x images) is done upstream by
                     ``spatial_join.point_in_bbox_join`` (cell equi-join);
  phase 2 (dedup)  — inside each image group, points are mapped through the
                     inverse affine to pixel (row, col); the distinct tiles
                     they touch are decoded ONCE each (A9 tile dedup);
  phase 3 (lookup) — values gathered from decoded tiles, nodata flagged;
  phase 4 (ring)   — nodata points fall back to an expanding Chebyshev ring
                     search for the nearest valid pixel (exact center-distance
                     scoring, deterministic row/col tie-break), bounded by
                     ``max_ring`` — the J5 kNN-flavoured ring search.

The group stage is ``applyInPandas`` keyed by image_id: one decode context per
image, vectorized numpy inside.  Output is one row per (point, image)
candidate with value/validity/ring metadata.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rasteret_spark import crs
from rasteret_spark.format import miniraster as mr

SAMPLES_SCHEMA = (
    "point_index bigint, image_id string, px_col int, px_row int, "
    "in_bounds boolean, value double, valid boolean, ring_steps int, "
    "sample_col int, sample_row int"
)


def _sample_one_image(pdf: pd.DataFrame, max_ring: int) -> pd.DataFrame:
    blob = bytes(pdf["bytes"].iloc[0])
    meta = mr.parse_header(blob[: mr.header_len_from_prefix(blob[:8])])
    a, _, c, _, e, f = meta.transform

    xs, ys = crs.from_lonlat(
        meta.epsg, pdf["x"].to_numpy(dtype=float), pdf["y"].to_numpy(dtype=float)
    )
    fcols = (xs - c) / a
    frows = (ys - f) / e
    cols = np.floor(fcols).astype(np.int64)
    rows = np.floor(frows).astype(np.int64)
    in_bounds = (cols >= 0) & (cols < meta.width) & (rows >= 0) & (rows < meta.height)

    n = len(pdf)
    value = np.full(n, np.nan)
    valid = np.zeros(n, dtype=bool)
    ring_steps = np.zeros(n, dtype=np.int32)
    s_col = np.where(in_bounds, cols, -1).astype(np.int64)
    s_row = np.where(in_bounds, rows, -1).astype(np.int64)

    # phase 2+3: distinct tiles -> decode once -> gather
    tile_cache: dict[tuple[int, int], np.ndarray] = {}

    def tile_of(r: int, cc: int) -> np.ndarray:
        ty, tx = r // meta.tile_h, cc // meta.tile_w
        key = (ty, tx)
        if key not in tile_cache:
            tile_cache[key] = mr.read_window(
                blob, meta, tx * meta.tile_w, ty * meta.tile_h, meta.tile_w, meta.tile_h
            )
        return tile_cache[key]

    idxs = np.nonzero(in_bounds)[0]
    for i in idxs:
        r, cc = int(rows[i]), int(cols[i])
        t = tile_of(r, cc)
        v = float(t[r % meta.tile_h, cc % meta.tile_w])
        value[i] = v
        valid[i] = meta.nodata is None or not np.isclose(v, meta.nodata)

    # phase 4: ring fallback for in-bounds nodata points
    if max_ring > 0 and meta.nodata is not None:
        for i in idxs:
            if valid[i]:
                continue
            r, cc = int(rows[i]), int(cols[i])
            best = None  # (dist2, row, col, value)
            for k in range(1, max_ring + 1):
                r0, r1 = max(r - k, 0), min(r + k, meta.height - 1)
                c0, c1 = max(cc - k, 0), min(cc + k, meta.width - 1)
                win = mr.read_window(blob, meta, c0, r0, c1 - c0 + 1, r1 - r0 + 1)
                rr, ccs = np.mgrid[r0 : r1 + 1, c0 : c1 + 1]
                on_ring = np.maximum(np.abs(rr - r), np.abs(ccs - cc)) == k
                ok = on_ring & ~np.isclose(win, meta.nodata)
                if ok.any():
                    drr = rr[ok] + 0.5 - frows[i]
                    dcc = ccs[ok] + 0.5 - fcols[i]
                    d2 = drr * drr + dcc * dcc
                    order = np.lexsort((ccs[ok], rr[ok], d2))
                    j = order[0]
                    cand = (float(d2[j]), int(rr[ok][j]), int(ccs[ok][j]), float(win[ok][j]))
                    if best is None or cand < best:
                        best = cand
                    # a strictly closer pixel can still appear one ring out;
                    # check the next ring then stop (exact-distance guarantee,
                    # same bounded-continue rule as the reference ring search)
                    if best is not None and best[0] <= (k - 0.5) ** 2:
                        break
            if best is not None:
                value[i] = best[3]
                valid[i] = True
                ring_steps[i] = int(np.ceil(max(abs(best[1] - r), abs(best[2] - cc))))
                s_row[i], s_col[i] = best[1], best[2]

    return pd.DataFrame(
        {
            "point_index": pdf["point_index"].to_numpy(),
            "image_id": pdf["image_id"].to_numpy(),
            "px_col": cols.astype(np.int32),
            "px_row": rows.astype(np.int32),
            "in_bounds": in_bounds,
            "value": value,
            "valid": valid,
            "ring_steps": ring_steps,
            "sample_col": s_col.astype(np.int32),
            "sample_row": s_row.astype(np.int32),
        }
    )


def sample_points(candidates: DataFrame, max_ring: int = 0) -> DataFrame:
    """candidates: output of ``point_in_bbox_join`` carrying at least
    (point_index, x, y, image_id, bytes).  Returns SAMPLES_SCHEMA rows."""

    def run(key, pdf):
        return _sample_one_image(pdf, max_ring)

    return (
        candidates.select("point_index", "x", "y", "image_id", "bytes")
        .groupBy("image_id")
        .applyInPandas(run, schema=SAMPLES_SCHEMA)
    )
