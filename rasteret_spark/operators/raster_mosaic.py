"""Pixel-level first-valid mosaics and [T, C, H, W] chip stacks.

Spark re-expression of the reference's pixel compositing paths:

  * first-valid-per-pixel mosaic over decoded windows in deterministic order
    (rasteret `src/rasteret/integrations/torchgeo.py:958-995`);
  * chip serving — per-chip [T, C, H, W] window tensors
    (`torchgeo.py:997-1236`);
  * nearest-neighbour reprojection of each source image onto the target chip
    grid (the R8/R9 warp/merge-resample path, reference
    `src/rasteret/core/utils.py:215-344` + `core/rio_semantics.py:51-313`) —
    every contributing image is resampled onto ONE common grid before
    compositing, so cross-CRS and cross-resolution inputs mosaic correctly.

Plan shape (scale discipline):

  1. Candidate (chip x image) pairs come from the native cell-cover
     ``bbox_join`` upstream — LIGHT columns only, no blobs in that shuffle.
  2. Pairs join image payloads on ``image_id``, then group by ``chip_id``:
     each blob moves through exactly ONE shuffle, into the chip group that
     composites it.  Chips are independent -> perfectly parallel across
     executors; group size is bounded by the temporal depth of the stack,
     not by dataset size.
  3. ``applyInPandas`` composites one chip per group with vectorized numpy;
     images are sorted INSIDE the kernel by (datetime desc, image_id) so the
     result is independent of upstream row order (mosaic order-invariance,
     SURVEY.md §7 "hard parts").

The target grid is axis-aligned in the GRID CRS — ``chip_id, xmin, ymax,
xres, yres, width, height`` with x = xmin + (col+0.5)*xres,
y = ymax - (row+0.5)*yres, all in grid-CRS units.  The grid CRS defaults to
lon/lat (EPSG:4326); a ``grid_epsg`` column on the chip rows selects any
registered CRS (the reference's native-CRS mosaic path: it auto-detects the
most-common CRS and composites in it, `src/rasteret/core/execution.py:
396-456` + `core/raster_accessor.py:1048-1099` — here ``most_common_epsg``
feeds ``Collection.mosaic(grid_epsg="auto")``), so single-zone UTM archives
mosaic in their own meters instead of resampling through lon/lat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark import crs
from rasteret_spark.format import miniraster as mr
from rasteret_spark.operators.util import nanlist

CHIP_COLS = ("chip_id", "chip_xmin", "chip_ymax", "chip_xres", "chip_yres",
             "chip_w", "chip_h")

# outputs are self-describing (R10): every row carries its grid georeferencing
# (origin/res/size + grid CRS) so pixel coords reconstruct from the row alone —
# the distributed analogue of the reference's CF/spatial_ref attrs
# (`src/rasteret/core/raster_accessor.py:1328-1477`)
GRID_COLS_SCHEMA = (
    "chip_xmin double, chip_ymax double, chip_xres double, chip_yres double, "
    "chip_w int, chip_h int, grid_epsg int"
)

MOSAIC_SCHEMA = (
    "chip_id string, band int, n_images int, n_contributing int, "
    "filled bigint, v_sum double, values array<double>, "
    + GRID_COLS_SCHEMA
    + ", n_failed int, capped boolean, status string"
)

CHIP_STACK_SCHEMA = (
    "chip_id string, t_index int, image_id string, datetime timestamp, "
    "band int, filled bigint, values array<double>, "
    + GRID_COLS_SCHEMA
    + ", capped boolean, status string"
)

# default temporal-depth bound: a chip under a 10,000-scene archive must not
# drag every blob into one applyInPandas group.  32 newest scenes cover any
# realistic cloud/nodata fill depth (synthetic fixture plants nodata in ~20%
# of images -> P(32 straight misses) ~ 0.2^32); override per query.
DEFAULT_MAX_IMAGES_PER_CHIP = 32


def _target_centers_in_source(
    meta, grid_epsg: int, xmin, ymax, xres, yres, width, height
):
    """Target pixel centers (grid-CRS coords) -> source-CRS coords, flattened
    row-major.  grid_epsg=4326 reproduces the original lon/lat grid path."""
    gxs = xmin + (np.arange(width) + 0.5) * xres
    gys = ymax - (np.arange(height) + 0.5) * yres
    gx, gy = np.meshgrid(gxs, gys)
    return crs.transform_points(grid_epsg, meta.epsg, gx.ravel(), gy.ravel())


def reproject_nearest(
    reader: mr.CachedReader,
    band: int,
    xmin: float,
    ymax: float,
    xres: float,
    yres: float,
    width: int,
    height: int,
    grid_epsg: int = 4326,
) -> np.ndarray:
    """Nearest-neighbour resample of one image band onto the target grid
    (grid-CRS coords; default lon/lat).  Returns float64 (height, width);
    NaN where the target pixel falls outside the image or on nodata.  One
    windowed read covers exactly the touched source region (tile-pruned by
    the reader)."""
    meta = reader.meta
    xs, ys = _target_centers_in_source(
        meta, grid_epsg, xmin, ymax, xres, yres, width, height
    )
    a, _, c, _, e, f = meta.transform
    cols = np.floor((xs - c) / a).astype(np.int64)
    rows = np.floor((ys - f) / e).astype(np.int64)
    inb = (cols >= 0) & (cols < meta.width) & (rows >= 0) & (rows < meta.height)
    out = np.full(width * height, np.nan)
    if inb.any():
        r0, r1 = int(rows[inb].min()), int(rows[inb].max())
        c0, c1 = int(cols[inb].min()), int(cols[inb].max())
        win = reader.window(c0, r0, c1 - c0 + 1, r1 - r0 + 1, band=band).astype(
            np.float64
        )
        vals = win[rows[inb] - r0, cols[inb] - c0]
        if meta.nodata is not None:
            if np.isnan(meta.nodata):
                vals = np.where(np.isnan(vals), np.nan, vals)
            else:
                vals = np.where(vals == meta.nodata, np.nan, vals)
        out[inb] = vals
    return out.reshape(height, width)


def reproject_bilinear(
    reader: mr.CachedReader,
    band: int,
    xmin: float,
    ymax: float,
    xres: float,
    yres: float,
    width: int,
    height: int,
    grid_epsg: int = 4326,
) -> np.ndarray:
    """Bilinear resample onto the target grid (the reference's
    rasterio.warp non-nearest path, `src/rasteret/core/utils.py:215-344`).

    Sample positions are target pixel centers in source fractional pixel
    space; the 4 surrounding source pixels interpolate with edge-clamped
    indices.  Strict nodata semantics: any invalid corner poisons the
    output pixel (NaN) — no partial-weight renormalization, so results are
    deterministic and maskable."""
    meta = reader.meta
    xs, ys = _target_centers_in_source(
        meta, grid_epsg, xmin, ymax, xres, yres, width, height
    )
    a, _, c, _, e, f = meta.transform
    fc = (xs - c) / a
    fr = (ys - f) / e
    # a target pixel participates iff its point lands inside the raster
    inb = (fc >= 0) & (fc < meta.width) & (fr >= 0) & (fr < meta.height)
    out = np.full(width * height, np.nan)
    if not inb.any():
        return out.reshape(height, width)
    gx = fc[inb] - 0.5
    gy = fr[inb] - 0.5
    c0 = np.clip(np.floor(gx).astype(np.int64), 0, meta.width - 1)
    r0 = np.clip(np.floor(gy).astype(np.int64), 0, meta.height - 1)
    c1 = np.minimum(c0 + 1, meta.width - 1)
    r1 = np.minimum(r0 + 1, meta.height - 1)
    wx = np.clip(gx - np.floor(gx), 0.0, 1.0)
    wy = np.clip(gy - np.floor(gy), 0.0, 1.0)
    cmin, cmax = int(c0.min()), int(c1.max())
    rmin, rmax = int(r0.min()), int(r1.max())
    win = reader.window(cmin, rmin, cmax - cmin + 1, rmax - rmin + 1, band=band).astype(
        np.float64
    )
    if meta.nodata is not None:
        win = np.where(
            np.isnan(win) if np.isnan(meta.nodata) else win == meta.nodata,
            np.nan,
            win,
        )
    v00 = win[r0 - rmin, c0 - cmin]
    v01 = win[r0 - rmin, c1 - cmin]
    v10 = win[r1 - rmin, c0 - cmin]
    v11 = win[r1 - rmin, c1 - cmin]
    top = (1.0 - wx) * v00 + wx * v01
    bot = (1.0 - wx) * v10 + wx * v11
    out[inb] = (1.0 - wy) * top + wy * bot  # NaN corners propagate
    return out.reshape(height, width)


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Keys bicubic kernel weights (a = -0.5, the Catmull-Rom spline GDAL's
    ``Resampling.cubic`` uses) for taps at offsets (-1, 0, 1, 2) given the
    fractional position t in [0, 1).  Shape (p, 4); rows sum to 1."""
    a = -0.5
    d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t
    w0 = a * (d0**3 - 5 * d0**2 + 8 * d0 - 4)
    w1 = (a + 2) * d1**3 - (a + 3) * d1**2 + 1
    w2 = (a + 2) * d2**3 - (a + 3) * d2**2 + 1
    w3 = a * (d3**3 - 5 * d3**2 + 8 * d3 - 4)
    return np.stack([w0, w1, w2, w3], axis=1)


def reproject_cubic(
    reader: mr.CachedReader,
    band: int,
    xmin: float,
    ymax: float,
    xres: float,
    yres: float,
    width: int,
    height: int,
    grid_epsg: int = 4326,
) -> np.ndarray:
    """Bicubic (Keys, a=-0.5) resample onto the target grid — the reference's
    rasterio ``Resampling.cubic`` surface (`src/rasteret/core/utils.py:215-344`).

    4x4 edge-clamped neighborhood per target pixel; strict nodata semantics:
    any invalid tap poisons the output pixel (NaN), same rule as bilinear."""
    meta = reader.meta
    xs, ys = _target_centers_in_source(
        meta, grid_epsg, xmin, ymax, xres, yres, width, height
    )
    a, _, c, _, e, f = meta.transform
    fc = (xs - c) / a
    fr = (ys - f) / e
    inb = (fc >= 0) & (fc < meta.width) & (fr >= 0) & (fr < meta.height)
    out = np.full(width * height, np.nan)
    if not inb.any():
        return out.reshape(height, width)
    gx = fc[inb] - 0.5
    gy = fr[inb] - 0.5
    c0 = np.floor(gx).astype(np.int64)
    r0 = np.floor(gy).astype(np.int64)
    tx = np.clip(gx - c0, 0.0, 1.0)
    ty = np.clip(gy - r0, 0.0, 1.0)
    cols4 = np.clip(c0[:, None] + np.arange(-1, 3), 0, meta.width - 1)
    rows4 = np.clip(r0[:, None] + np.arange(-1, 3), 0, meta.height - 1)
    cmin, cmax = int(cols4.min()), int(cols4.max())
    rmin, rmax = int(rows4.min()), int(rows4.max())
    win = reader.window(cmin, rmin, cmax - cmin + 1, rmax - rmin + 1, band=band).astype(
        np.float64
    )
    if meta.nodata is not None:
        win = np.where(
            np.isnan(win) if np.isnan(meta.nodata) else win == meta.nodata,
            np.nan,
            win,
        )
    taps = win[rows4[:, :, None] - rmin, cols4[:, None, :] - cmin]  # (p, 4, 4)
    wx = _cubic_weights(tx)  # (p, 4)
    wy = _cubic_weights(ty)
    out[inb] = np.einsum("pr,pc,prc->p", wy, wx, taps)  # NaN taps propagate
    return out.reshape(height, width)


def _bbox_to_source(
    src_epsg: int, grid_epsg: int, xmin: float, ymin: float, xmax: float, ymax: float
) -> tuple[float, float, float, float]:
    """Grid-CRS bbox -> source-CRS bounding box.  The 4326 path keeps the
    original corner-exact/densified ``bbox_from_lonlat`` (bit-identical to
    the pre-grid_epsg behavior); other grids go through the densified
    ``transform_bbox`` ring."""
    if grid_epsg == 4326:
        return crs.bbox_from_lonlat(src_epsg, xmin, ymin, xmax, ymax)
    return crs.transform_bbox(grid_epsg, src_epsg, (xmin, ymin, xmax, ymax))


def reproject_average(
    reader: mr.CachedReader,
    band: int,
    xmin: float,
    ymax: float,
    xres: float,
    yres: float,
    width: int,
    height: int,
    grid_epsg: int = 4326,
) -> np.ndarray:
    """Average resample onto the target grid — the reference's rasterio
    ``Resampling.average`` surface (`src/rasteret/core/utils.py:215-344`).

    Semantics (documented, oracle-pinned): each target pixel takes the mean
    of all VALID source pixels whose centers fall inside it; target pixels
    with no contributing center (upsampling regime) fall back to the nearest
    sample, so average == nearest when the target is finer than the source.
    Valid-only averaging means nodata never dilutes a mean (no poisoning) —
    downsampling is where this method earns its keep."""
    meta = reader.meta
    a, _, c, _, e, f = meta.transform
    # source window touched by the target extent (corner-mapped for separable
    # CRS pairs, densified-boundary where edges curve)
    sx0, sy0, sx1, sy1 = _bbox_to_source(
        meta.epsg, grid_epsg,
        xmin, ymax - height * yres, xmin + width * xres, ymax,
    )
    fcs = (np.array([sx0, sx1]) - c) / a
    frs = (np.array([sy0, sy1]) - f) / e
    c0 = max(int(np.floor(fcs.min())), 0)
    c1 = min(int(np.ceil(fcs.max())), meta.width)
    r0 = max(int(np.floor(frs.min())), 0)
    r1 = min(int(np.ceil(frs.max())), meta.height)
    out = np.full(width * height, np.nan)
    if c1 <= c0 or r1 <= r0:
        return out.reshape(height, width)
    win = reader.window(c0, r0, c1 - c0, r1 - r0, band=band).astype(np.float64)
    if meta.nodata is not None:
        win = np.where(
            np.isnan(win) if np.isnan(meta.nodata) else win == meta.nodata,
            np.nan,
            win,
        )
    # source pixel centers -> target cell indices (in grid-CRS coords)
    src_x = a * (c0 + np.arange(c1 - c0) + 0.5) + c
    src_y = e * (r0 + np.arange(r1 - r0) + 0.5) + f
    if crs.is_separable(meta.epsg) and crs.is_separable(grid_epsg):
        # separable COMPOSITION through the lon/lat hub: x depends only on x
        gx, _ = crs.transform_points(meta.epsg, grid_epsg, src_x, np.zeros_like(src_x))
        _, gy = crs.transform_points(meta.epsg, grid_epsg, np.zeros_like(src_y), src_y)
        tcol = np.floor((gx - xmin) / xres).astype(np.int64)
        trow = np.floor((ymax - gy) / yres).astype(np.int64)
        gc, gr = np.meshgrid(tcol, trow)
    else:
        gsx, gsy = np.meshgrid(src_x, src_y)
        tx, ty = crs.transform_points(meta.epsg, grid_epsg, gsx.ravel(), gsy.ravel())
        gc = np.floor((tx - xmin) / xres).astype(np.int64).reshape(gsx.shape)
        gr = np.floor((ymax - ty) / yres).astype(np.int64).reshape(gsx.shape)
    keep = (gc >= 0) & (gc < width) & (gr >= 0) & (gr < height) & ~np.isnan(win)
    if keep.any():
        flat = (gr[keep] * width + gc[keep]).astype(np.int64)
        sums = np.zeros(width * height)
        cnts = np.zeros(width * height)
        np.add.at(sums, flat, win[keep])
        np.add.at(cnts, flat, 1.0)
        got = cnts > 0
        out[got] = sums[got] / cnts[got]
    # cells without a contributing source center: nearest fallback
    empty = np.isnan(out)
    if empty.any():
        near = reproject_nearest(
            reader, band, xmin, ymax, xres, yres, width, height, grid_epsg=grid_epsg
        )
        out[empty] = near.ravel()[empty]
    return out.reshape(height, width)


RESAMPLERS = {
    "nearest": reproject_nearest,
    "bilinear": reproject_bilinear,
    "cubic": reproject_cubic,
    "average": reproject_average,
}


def reproject_to_grid(
    reader: mr.CachedReader,
    band: int,
    *grid,
    method: str = "nearest",
    grid_epsg: int = 4326,
) -> np.ndarray:
    fn = RESAMPLERS.get(method)
    if fn is None:
        raise ValueError(f"unknown resample method {method!r} (have {sorted(RESAMPLERS)})")
    return fn(reader, band, *grid, grid_epsg=grid_epsg)


def _sorted_group(pdf: pd.DataFrame, newest_first: bool) -> pd.DataFrame:
    return pdf.sort_values(
        ["datetime", "image_id"], ascending=[not newest_first, True]
    ).reset_index(drop=True)


def _depth_cap(
    pairs: DataFrame, max_images_per_chip: int, newest_first: bool
) -> DataFrame:
    """Cap the temporal depth BEFORE blobs group: a window over (chip_id) in
    composite order keeps only the first N candidates, so a chip sitting
    under a 10,000-scene archive does not drag 10,000 blobs into one group
    when the newest handful fill it (the knob the reference's query-limited
    chip reads expose).

    Adds ``n_candidates`` (the PRE-cap per-chip candidate count, same
    window — no extra shuffle) so downstream kernels can surface a
    ``capped`` flag: a truncated chip is visible in the output, never a
    silent drop.  A pre-existing ``n_candidates`` column is kept (the first
    cap's count is the true total when capping twice)."""
    order = [
        F.col("datetime").desc() if newest_first else F.col("datetime").asc(),
        F.col("image_id").asc(),
    ]
    w = Window.partitionBy("chip_id").orderBy(*order)
    pairs = pairs.withColumn("_rn", F.row_number().over(w))
    if "n_candidates" not in pairs.columns:
        pairs = pairs.withColumn(
            "n_candidates", F.count(F.lit(1)).over(Window.partitionBy("chip_id"))
        )
    return pairs.filter(F.col("_rn") <= max_images_per_chip).drop("_rn")


def _grid_epsg_of(pdf: pd.DataFrame, r0: pd.Series) -> int:
    """Grid CRS of a chip group: the optional ``grid_epsg`` column (absent ->
    lon/lat).  Constant per chip by construction (one grid per request)."""
    return int(r0["grid_epsg"]) if "grid_epsg" in pdf.columns else 4326


def _grid_cols(r0: pd.Series, grid_epsg: int) -> dict:
    return {
        "chip_xmin": float(r0["chip_xmin"]),
        "chip_ymax": float(r0["chip_ymax"]),
        "chip_xres": float(r0["chip_xres"]),
        "chip_yres": float(r0["chip_yres"]),
        "chip_w": int(r0["chip_w"]),
        "chip_h": int(r0["chip_h"]),
        "grid_epsg": int(grid_epsg),
    }


def first_valid_mosaic_pixels(
    pairs_with_blobs: DataFrame,
    bands: tuple[int, ...] | list[int] = (0,),
    newest_first: bool = True,
    method: str = "nearest",
    max_images_per_chip: int | None = DEFAULT_MAX_IMAGES_PER_CHIP,
) -> DataFrame:
    """Per-pixel first-valid composite per chip.

    ``pairs_with_blobs`` columns: CHIP_COLS + image_id, datetime, bytes (one
    row per candidate chip x image pair, blobs already joined).  For each
    chip and band, images are visited newest-first (deterministic tie-break
    on image_id) and each still-empty pixel takes the first valid value —
    the reference's first-valid precedence (`torchgeo.py:958-995`).

    ``max_images_per_chip`` (default ``DEFAULT_MAX_IMAGES_PER_CHIP``) bounds
    the blobs shuffled into each chip group; pass ``None`` to disable.  The
    cap trades completeness for boundedness — pick N >= the worst-case
    cloud/nodata depth.

    A corrupt blob is skipped (counted in ``n_failed``; ``status`` carries
    the first error) instead of failing the stage — per-record failure
    containment parity (`src/rasteret/core/execution.py:274-297`).  Output
    rows are self-describing: GRID_COLS_SCHEMA georeferencing rides along.
    """
    want_bands = tuple(bands)
    if max_images_per_chip is not None:
        pairs_with_blobs = _depth_cap(pairs_with_blobs, max_images_per_chip, newest_first)

    def composite(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _sorted_group(pdf, newest_first)
        r0 = pdf.iloc[0]
        # depth-cap visibility: n_candidates (pre-cap count from _depth_cap)
        # vs rows actually present — a truncated chip reports capped=True
        ncand = int(r0["n_candidates"]) if "n_candidates" in pdf.columns else len(pdf)
        capped = bool(ncand > len(pdf))
        w, h = int(r0["chip_w"]), int(r0["chip_h"])
        grid = (float(r0["chip_xmin"]), float(r0["chip_ymax"]),
                float(r0["chip_xres"]), float(r0["chip_yres"]), w, h)
        gepsg = _grid_epsg_of(pdf, r0)
        gcols = _grid_cols(r0, gepsg)
        out = []
        for band in want_bands:
            canvas = np.full((h, w), np.nan)
            contributing, n_failed, first_err = 0, 0, None
            for _, row in pdf.iterrows():
                if not np.isnan(canvas).any():
                    break  # chip fully composited — skip remaining decodes
                try:
                    reader = mr.CachedReader(bytes(row["bytes"]))
                    if band >= reader.meta.n_bands:
                        continue
                    rep = reproject_to_grid(
                        reader, band, *grid, method=method, grid_epsg=gepsg
                    )
                except Exception as e:  # quarantine the image, keep the chip
                    n_failed += 1
                    if first_err is None:
                        first_err = f"{type(e).__name__}: {e}"[:200]
                    continue
                need = np.isnan(canvas) & ~np.isnan(rep)
                if need.any():
                    canvas[need] = rep[need]
                    contributing += 1
            filled = int((~np.isnan(canvas)).sum())
            out.append(
                {
                    "chip_id": r0["chip_id"],
                    "band": band,
                    "n_images": int(len(pdf)),
                    "n_contributing": contributing,
                    "filled": filled,
                    "v_sum": float(np.nansum(canvas)) if filled else None,
                    "values": nanlist(canvas.ravel()),
                    **gcols,
                    "n_failed": n_failed,
                    "capped": capped,
                    "status": "ok" if n_failed == 0 else f"partial: {first_err}",
                }
            )
        return pd.DataFrame(out)

    return pairs_with_blobs.groupBy("chip_id").applyInPandas(
        composite, schema=MOSAIC_SCHEMA
    )


def chip_stack_pixels(
    pairs_with_blobs: DataFrame,
    bands: tuple[int, ...] | list[int] = (0,),
    method: str = "nearest",
    max_images_per_chip: int | None = DEFAULT_MAX_IMAGES_PER_CHIP,
) -> DataFrame:
    """[T, C, H, W] chip tensor, exploded as one row per (t, band).

    Time steps are ordered oldest-first with image_id tie-break (stable
    t_index regardless of input row order); every step is the image
    reprojected onto the chip grid — the distributed layout of the
    reference's stacked chip tensors (`torchgeo.py:997-1236`).

    ``max_images_per_chip`` bounds the T depth (the NEWEST N scenes are
    kept, then ordered oldest-first — the most training-relevant window);
    ``None`` disables.  A corrupt blob keeps its t slot (time axis stays
    stable) but emits quarantine rows with filled=0, values=null and the
    error in ``status``.  GRID_COLS_SCHEMA georeferencing rides along."""
    want_bands = tuple(bands)
    if max_images_per_chip is not None:
        pairs_with_blobs = _depth_cap(
            pairs_with_blobs, max_images_per_chip, newest_first=True
        )

    def stack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _sorted_group(pdf, newest_first=False)
        r0 = pdf.iloc[0]
        ncand = int(r0["n_candidates"]) if "n_candidates" in pdf.columns else len(pdf)
        capped = bool(ncand > len(pdf))
        w, h = int(r0["chip_w"]), int(r0["chip_h"])
        grid = (float(r0["chip_xmin"]), float(r0["chip_ymax"]),
                float(r0["chip_xres"]), float(r0["chip_yres"]), w, h)
        gepsg = _grid_epsg_of(pdf, r0)
        gcols = _grid_cols(r0, gepsg)
        out = []
        for t, (_, row) in enumerate(pdf.iterrows()):
            base = {
                "chip_id": r0["chip_id"],
                "t_index": t,
                "image_id": row["image_id"],
                "datetime": row["datetime"],
                **gcols,
                "capped": capped,
            }
            try:
                reader = mr.CachedReader(bytes(row["bytes"]))
                for band in want_bands:
                    if band >= reader.meta.n_bands:
                        continue
                    rep = reproject_to_grid(
                        reader, band, *grid, method=method, grid_epsg=gepsg
                    )
                    out.append(
                        {
                            **base,
                            "band": band,
                            "filled": int((~np.isnan(rep)).sum()),
                            "values": nanlist(rep.ravel()),
                            "status": "ok",
                        }
                    )
            except Exception as e:  # quarantine the time step, keep the chip
                out.append(
                    {
                        **base,
                        "band": -1,
                        "filled": 0,
                        "values": None,
                        "status": f"{type(e).__name__}: {e}"[:200],
                    }
                )
        return pd.DataFrame(out)

    return pairs_with_blobs.groupBy("chip_id").applyInPandas(
        stack, schema=CHIP_STACK_SCHEMA
    )


def most_common_epsg(images: DataFrame, epsg_col: str = "epsg") -> int:
    """Auto target-CRS detection: the mode of the record CRSes with a
    deterministic tie-break (the reference's most-common-CRS pick before
    reprojection, `src/rasteret/core/execution.py:396-456`)."""
    row = (
        images.groupBy(epsg_col)
        .count()
        .orderBy(F.col("count").desc(), F.col(epsg_col).asc())
        .first()
    )
    if row is None:
        raise ValueError("empty image table — no CRS to detect")
    return int(row[0])


def chips_as_aois(chips: DataFrame) -> DataFrame:
    """CHIP_COLS -> the aoi_* bbox columns (LON/LAT) the cell-cover join
    consumes.  SINGLE definition of the chip-extent convention (pixel-edge
    aligned) — shared by the mosaic and chip-serving paths so they cannot
    diverge.

    Lon/lat grids (no ``grid_epsg`` column) stay pure native expressions.
    Projected grids go through a vectorized ``mapInPandas`` stage that maps
    each chip's DENSIFIED boundary to lon/lat and takes bounds (curvature-
    safe for Transverse Mercator) — still fully distributed, numpy across
    all chips of a batch at once."""
    chips = chips.withColumn(
        "aoi_xmin", F.col("chip_xmin")
    ).withColumn(
        "aoi_xmax", F.col("chip_xmin") + F.col("chip_w") * F.col("chip_xres")
    ).withColumn(
        "aoi_ymax", F.col("chip_ymax")
    ).withColumn(
        "aoi_ymin", F.col("chip_ymax") - F.col("chip_h") * F.col("chip_yres")
    )
    if "grid_epsg" not in chips.columns:
        return chips

    schema = chips.schema  # same columns; aoi_* rewritten to lon/lat

    def to_lonlat_bounds(batches):
        t = np.linspace(0.0, 1.0, 8)
        for pdf in batches:
            for epsg in pdf["grid_epsg"].unique():
                m = pdf["grid_epsg"] == epsg
                if int(epsg) == 4326:
                    continue  # extent already lon/lat
                x0 = pdf.loc[m, "aoi_xmin"].to_numpy()[:, None]
                x1 = pdf.loc[m, "aoi_xmax"].to_numpy()[:, None]
                y0 = pdf.loc[m, "aoi_ymin"].to_numpy()[:, None]
                y1 = pdf.loc[m, "aoi_ymax"].to_numpy()[:, None]
                xs = np.concatenate(
                    [x0 + (x1 - x0) * t, np.broadcast_to(x1, (len(x1), len(t))),
                     x1 + (x0 - x1) * t, np.broadcast_to(x0, (len(x0), len(t)))],
                    axis=1,
                )
                ys = np.concatenate(
                    [np.broadcast_to(y0, (len(y0), len(t))), y0 + (y1 - y0) * t,
                     np.broadcast_to(y1, (len(y1), len(t))), y1 + (y0 - y1) * t],
                    axis=1,
                )
                lon, lat = crs.to_lonlat(int(epsg), xs.ravel(), ys.ravel())
                lon = lon.reshape(xs.shape)
                lat = lat.reshape(ys.shape)
                pdf.loc[m, "aoi_xmin"] = lon.min(axis=1)
                pdf.loc[m, "aoi_xmax"] = lon.max(axis=1)
                pdf.loc[m, "aoi_ymin"] = lat.min(axis=1)
                pdf.loc[m, "aoi_ymax"] = lat.max(axis=1)
            yield pdf

    return chips.mapInPandas(to_lonlat_bounds, schema=schema)


def join_payload_grouped(
    cands: DataFrame,
    images_payload: DataFrame,
    broadcast_pairs: bool | None = None,
) -> DataFrame:
    """Join light (chip x image) candidates to blob payloads with the
    one-blob-shuffle guarantee: candidates group into one per-image chip
    LIST (light columns), and that grouped side joins the payload under the
    same size-guarded broadcast the zonal path uses
    (``decode.grouped_side_choice``).  Broadcast path: blobs never shuffle
    at the join — the only blob exchange left is the final per-chip group.
    Above the pair bound the plan falls back to a hash join on image_id
    (the 10^9-pair regime where broadcasting would blow the driver)."""
    from rasteret_spark.operators.decode import grouped_side_choice

    chip_cols = [c for c in cands.columns if c != "image_id"]
    agg = cands.groupBy("image_id").agg(
        F.collect_list(F.struct(*chip_cols)).alias("_chips")
    )
    agg, use_broadcast = grouped_side_choice(agg, broadcast_pairs, "_chips")
    side = F.broadcast(agg) if use_broadcast else agg
    return (
        images_payload.join(side, "image_id")
        .withColumn("_c", F.explode("_chips"))
        .drop("_chips")
        .select(*images_payload.columns, "_c.*")
    )


def chip_candidates(
    chips: DataFrame,
    images_light: DataFrame,
    images_payload: DataFrame,
    res: int = 7,
    max_images_per_chip: int | None = None,
    newest_first: bool = True,
    broadcast_pairs: bool | None = None,
) -> DataFrame:
    """chips x images candidate pairs via the native cell-cover join, then
    payload join — CHIP_COLS + image_id + datetime + bytes, blobs through
    exactly one shuffle (the per-chip group; the payload join broadcasts
    the grouped candidate list under the size guard, see
    ``join_payload_grouped``).  ``chips`` needs CHIP_COLS; ``images_light``
    needs image_id + img_xmin/_ymin/_xmax/_ymax; ``images_payload`` needs
    image_id, datetime, bytes.

    ``max_images_per_chip`` caps the temporal depth HERE, on light columns
    (datetime joined without bytes), BEFORE any blob moves — under a
    10,000-scene archive the dropped candidates never shuffle their
    payloads.  Callers that cap here should pass ``max_images_per_chip=
    None`` to the downstream pixel kernel (capping twice is correct but
    windows the rows once more for nothing).

    NOTE: in auto mode (``broadcast_pairs=None``) the size guard runs an
    eager count of the candidate join at PLAN-BUILD time (same contract as
    the zonal path's ``grouped_side_choice``) and keeps one grouped cache
    live until the next auto-mode call; pass an explicit True/False to stay
    fully lazy."""
    from rasteret_spark.operators.spatial_join import bbox_join

    extra = ["grid_epsg"] if "grid_epsg" in chips.columns else []
    cands = bbox_join(images_light, chips_as_aois(chips), res=res).select(
        *CHIP_COLS, *extra, "image_id"
    )
    if max_images_per_chip is not None:
        light_dt = images_payload.select("image_id", "datetime")
        cands = _depth_cap(
            cands.join(light_dt, "image_id"), max_images_per_chip, newest_first
        ).drop("datetime")
    return join_payload_grouped(cands, images_payload, broadcast_pairs)
