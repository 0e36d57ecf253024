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
                     by ``max_ring`` — the J5 kNN-flavoured ring search.
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
    "sample_col int, sample_row int"
)
NEIGHBORHOOD_COL = ", neighborhood array<double>"


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
        "value", "valid", "ring_steps", "sample_col", "sample_row",
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

        # phase 3 vectorized: group points by touched tile, decode each tile
        # once, gather all its point values in one fancy-index (A9 tile dedup)
        tile_ids = (rows // meta.tile_h) * meta.tiles_x + (cols // meta.tile_w)
        for t in np.unique(tile_ids[in_bounds]):
            sel = in_bounds & (tile_ids == t)
            ty, tx = int(t) // meta.tiles_x, int(t) % meta.tiles_x
            tile = reader._tile(meta.tile_index(band, ty, tx))
            value[sel] = tile[rows[sel] % meta.tile_h, cols[sel] % meta.tile_w]
        if meta.nodata is None:
            valid[in_bounds] = True
        else:
            valid[in_bounds] = value[in_bounds] != meta.nodata
        idxs = np.nonzero(in_bounds)[0]

        if max_ring > 0 and meta.nodata is not None:
            for i in idxs:
                if valid[i]:
                    continue
                r, cc = int(rows[i]), int(cols[i])
                best = None  # (dist2, row, col, value)
                for k in range(1, max_ring + 1):
                    r0, r1 = max(r - k, 0), min(r + k, meta.height - 1)
                    c0, c1 = max(cc - k, 0), min(cc + k, meta.width - 1)
                    win = reader.window(c0, r0, c1 - c0 + 1, r1 - r0 + 1, band=band)
                    rr, ccs = np.mgrid[r0 : r1 + 1, c0 : c1 + 1]
                    on_ring = np.maximum(np.abs(rr - r), np.abs(ccs - cc)) == k
                    ok = on_ring & (win.astype(np.float64) != meta.nodata)
                    if ok.any():
                        drr = rr[ok] + 0.5 - frows[i]
                        dcc = ccs[ok] + 0.5 - fcols[i]
                        d2 = drr * drr + dcc * dcc
                        j = np.lexsort((ccs[ok], rr[ok], d2))[0]
                        cand = (float(d2[j]), int(rr[ok][j]), int(ccs[ok][j]), float(win[ok][j]))
                        if best is None or cand < best:
                            best = cand
                    # a strictly closer pixel can still appear one ring out;
                    # continue until the best is certified (d <= (k-0.5) rule)
                    if best is not None and best[0] <= (k - 0.5) ** 2:
                        break
                if best is not None:
                    value[i] = best[3]
                    valid[i] = True
                    ring_steps[i] = int(max(abs(best[1] - r), abs(best[2] - cc)))
                    s_row[i], s_col[i] = best[1], best[2]

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
        if neighborhood > 0:
            # n x n edge-clamped window per in-bounds point (the reference's
            # neighbourhood_values, `src/rasteret/types.py:36-40`; clamped
            # offsets `core/point_sample_helpers.py:158-229`), row-major
            half = neighborhood // 2
            nb: list = []
            for i in range(n):
                if not in_bounds[i]:
                    nb.append(None)
                    continue
                rr0 = np.clip(int(rows[i]) - half, 0, meta.height - 1)
                cc0 = np.clip(int(cols[i]) - half, 0, meta.width - 1)
                rr0 = min(rr0, max(meta.height - neighborhood, 0))
                cc0 = min(cc0, max(meta.width - neighborhood, 0))
                wh = min(neighborhood, meta.height)
                ww = min(neighborhood, meta.width)
                win = reader.window(cc0, rr0, ww, wh, band=band)
                nb.append([float(v) for v in win.astype(np.float64).ravel()])
            # 1-D object array (equal-length lists must NOT collapse to 2-D)
            nb_arr = np.empty(n, dtype=object)
            for i, v in enumerate(nb):
                nb_arr[i] = v
            parts["neighborhood"].append(nb_arr)

    return {k: np.concatenate(v) if v else np.array([]) for k, v in parts.items()}


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
    ``array<double>`` column."""
    from rasteret_spark.operators.decode import _decode_parallelism, grouped_side_choice

    want_bands = tuple(bands) if bands is not None else (0,)
    agg = candidates.groupBy("image_id").agg(
        F.collect_list(F.struct("point_index", "x", "y")).alias("_pts")
    )
    agg, use_broadcast = grouped_side_choice(agg, broadcast_points, "_pts")
    if use_broadcast:
        # grouped probe side is small next to the blobs (size-guarded):
        # broadcast it so the sampling stage fuses with the image scan (no
        # blob shuffle); above the pair bound: shuffle join on image_id
        src = images.select("image_id", "bytes").join(F.broadcast(agg), "image_id")
    else:
        src = images.select("image_id", "bytes").join(agg, "image_id")
        src = src.repartition(_decode_parallelism(src, parallelism), "image_id")

    schema = SAMPLES_SCHEMA + (NEIGHBORHOOD_COL if neighborhood > 0 else "")
    col_names = [f.strip().split(" ")[0] for f in schema.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts: list[dict] = []
            for image_id, blob, pts in zip(pdf["image_id"], pdf["bytes"], pdf["_pts"]):
                reader = mr.CachedReader(bytes(blob))
                parts.append(
                    _sample_image(image_id, reader, pts, max_ring, want_bands, neighborhood)
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
