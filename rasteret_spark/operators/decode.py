"""Vectorized decode operators: tile-window reads, full-image stats, zonal
extraction (raster <-> vector).

Spark re-expression of rasteret's read pipeline R2-R6 (`src/rasteret/fetch/
cog.py`: tile-window planning 969-1089, byte-range coalescing 724-742, decode
843-966, merge 1092-1151, mask/crop 1154-1252 and 1401-1855): every stage
here consumes the cached ``meta`` struct (header-cache enrichment) and slices
byte ranges out of the ``bytes`` column — tiles intersecting the AOI window
are the only ones decoded.  All work happens inside ``mapInPandas`` batches;
the DataFrame plan stays declarative so Catalyst prunes columns and pushes
filters below these stages.

Masking semantics match the reference: a pixel contributes iff its center is
inside the AOI polygon AND its value is not nodata (valid_mask = coverage ∧
geometry ∧ nodata, `src/rasteret/fetch/cog.py:1642-1692`); fill never promotes
dtype.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark import crs, geom
from rasteret_spark.format import miniraster as mr


# --- window math --------------------------------------------------------------
def window_from_bbox(
    transform: tuple[float, ...],
    width: int,
    height: int,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
) -> tuple[int, int, int, int]:
    """bbox in pixel-CRS coords -> clamped (col_off, row_off, win_w, win_h).

    rasterio-style floor/ceil edge rule (parity with the window math in
    `src/rasteret/fetch/cog.py:1284-1375`): fractional cols/rows of the bbox
    corners, floor the min, ceil the max, clamp to the grid.
    """
    a, _, c, _, e, f = transform
    cols = [(xmin - c) / a, (xmax - c) / a]
    rows = [(ymin - f) / e, (ymax - f) / e]
    c0 = int(math.floor(min(cols)))
    c1 = int(math.ceil(max(cols)))
    r0 = int(math.floor(min(rows)))
    r1 = int(math.ceil(max(rows)))
    c0, c1 = max(c0, 0), min(c1, width)
    r0, r1 = max(r0, 0), min(r1, height)
    return c0, r0, max(c1 - c0, 0), max(r1 - r0, 0)


def pixel_centers_lonlat(
    transform: tuple[float, ...], epsg: int, col_off: int, row_off: int, win_w: int, win_h: int
) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat of every pixel center in the window, shape (win_h, win_w)."""
    a, _, c, _, e, f = transform
    cols = col_off + np.arange(win_w) + 0.5
    rows = row_off + np.arange(win_h) + 0.5
    xs = a * cols + c
    ys = e * rows + f
    gx, gy = np.meshgrid(xs, ys)
    lon, lat = crs.to_lonlat(epsg, gx.ravel(), gy.ravel())
    return lon.reshape(win_h, win_w), lat.reshape(win_h, win_w)


# --- per-image full decode stats (flagship decode benchmark stage) ------------
IMAGE_STATS_SCHEMA = (
    "image_id string, fmt string, caption string, width int, height int, "
    "px_count bigint, valid_count bigint, v_mean double, v_min double, v_max double"
)


def decode_image_stats(df: DataFrame) -> DataFrame:
    """Decode every image fully (all tiles via coalesced range reads) and emit
    per-image pixel stats.  Input needs columns: image_id, bytes, fmt, caption."""
    cols = ["image_id", "bytes", "fmt", "caption"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt, caption in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"]
            ):
                blob = bytes(blob)
                need = mr.header_len_from_prefix(blob[:8])
                meta = mr.parse_header(blob[:need])
                arr = mr.read_window(blob, meta)
                vals = arr.astype(np.float64)
                valid = np.ones(arr.shape, dtype=bool)
                if meta.nodata is not None:
                    valid = ~(
                        np.isclose(vals, meta.nodata)
                        | (np.isnan(vals) if np.isnan(meta.nodata) else False)
                    )
                v = vals[valid]
                out.append(
                    {
                        "image_id": image_id,
                        "fmt": fmt,
                        "caption": caption,
                        "width": meta.width,
                        "height": meta.height,
                        "px_count": int(arr.size),
                        "valid_count": int(valid.sum()),
                        "v_mean": float(v.mean()) if v.size else None,
                        "v_min": float(v.min()) if v.size else None,
                        "v_max": float(v.max()) if v.size else None,
                    }
                )
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


# --- zonal extraction (AOI x image join rows -> masked stats) ------------------
ZONAL_SCHEMA = (
    "image_id string, aoi_id string, caption string, "
    "win_col int, win_row int, win_w int, win_h int, "
    "px_count bigint, valid_count bigint, "
    "v_sum double, v_mean double, v_min double, v_max double"
)


def zonal_stats(joined: DataFrame) -> DataFrame:
    """Per (image, AOI) join row: window-read only intersecting tiles, mask by
    polygon (pixel-center PIP), aggregate valid pixels.

    Input columns required: image_id, bytes, caption, aoi_id, aoi_geometry
    (WKB lon/lat), aoi_xmin/aoi_ymin/aoi_xmax/aoi_ymax.
    """
    cols = [
        "image_id", "bytes", "caption", "aoi_id", "aoi_geometry",
        "aoi_xmin", "aoi_ymin", "aoi_xmax", "aoi_ymax",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(row.bytes)
                need = mr.header_len_from_prefix(blob[:8])
                meta = mr.parse_header(blob[:need])
                # AOI bbox (lon/lat) -> pixel CRS
                bx, by = crs.from_lonlat(
                    meta.epsg,
                    np.array([row.aoi_xmin, row.aoi_xmax]),
                    np.array([row.aoi_ymin, row.aoi_ymax]),
                )
                c0, r0, ww, wh = window_from_bbox(
                    meta.transform, meta.width, meta.height,
                    float(bx.min()), float(by.min()), float(bx.max()), float(by.max()),
                )
                rec = {
                    "image_id": row.image_id,
                    "aoi_id": row.aoi_id,
                    "caption": row.caption,
                    "win_col": c0,
                    "win_row": r0,
                    "win_w": ww,
                    "win_h": wh,
                    "px_count": 0,
                    "valid_count": 0,
                    "v_sum": None,
                    "v_mean": None,
                    "v_min": None,
                    "v_max": None,
                }
                if ww > 0 and wh > 0:
                    arr = mr.read_window(blob, meta, c0, r0, ww, wh)
                    lon, lat = pixel_centers_lonlat(meta.transform, meta.epsg, c0, r0, ww, wh)
                    inside = geom.points_in_polygon_wkb(
                        lon.ravel(), lat.ravel(), bytes(row.aoi_geometry)
                    ).reshape(wh, ww)
                    vals = arr.astype(np.float64)
                    valid = inside
                    if meta.nodata is not None:
                        valid = valid & ~np.isclose(vals, meta.nodata)
                    v = vals[valid]
                    rec.update(
                        px_count=int(inside.sum()),
                        valid_count=int(v.size),
                        v_sum=float(v.sum()) if v.size else None,
                        v_mean=float(v.mean()) if v.size else None,
                        v_min=float(v.min()) if v.size else None,
                        v_max=float(v.max()) if v.size else None,
                    )
                out.append(rec)
            yield pd.DataFrame(out)

    return joined.select(*cols).mapInPandas(run, schema=ZONAL_SCHEMA)


# --- driver-side single-process oracle (tests) ---------------------------------
def zonal_oracle_row(image_row: dict, aoi_row: dict) -> dict:
    """Independent oracle: decode the FULL image (no window path), mask, reduce.

    Used by tests to pin the Spark pipeline bit-for-bit (the reference pins
    its reads against rasterio the same way,
    `tests/test_dataset_pixel_comparison.py`)."""
    blob = image_row["bytes"]
    meta = mr.parse_header(blob[: mr.header_len_from_prefix(blob[:8])])
    arr = mr.decode_full(blob)
    lon, lat = pixel_centers_lonlat(meta.transform, meta.epsg, 0, 0, meta.width, meta.height)
    inside = geom.points_in_polygon_wkb(
        lon.ravel(), lat.ravel(), aoi_row["geometry"]
    ).reshape(meta.height, meta.width)
    vals = arr.astype(np.float64)
    valid = inside
    if meta.nodata is not None:
        valid = valid & ~np.isclose(vals, meta.nodata)
    v = vals[valid]
    return {
        "image_id": image_row["image_id"],
        "aoi_id": aoi_row["aoi_id"],
        "px_count": int(inside.sum()),
        "valid_count": int(v.size),
        "v_sum": float(v.sum()) if v.size else None,
        "v_mean": float(v.mean()) if v.size else None,
        "v_min": float(v.min()) if v.size else None,
        "v_max": float(v.max()) if v.size else None,
    }


def psnr_check(df: DataFrame) -> DataFrame:
    """Per-image decoded-pixel fidelity vs the deterministic regenerated
    original — drives the PSNR>=40dB gate for lossy formats.  Input columns:
    image_id, bytes, fmt + a regenerate key (image index from image_id)."""
    from rasteret_spark.format import codecs
    from rasteret_spark.sources import synthetic as syn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                arr = mr.decode_full(bytes(blob))
                i = int(image_id.split("-")[1])
                ref_row = syn.make_image_row(i)
                ref = mr.decode_full(ref_row["bytes"])
                lossless_ref = fmt not in ("qlossy",)
                p = codecs.psnr(ref.astype(np.float64), arr.astype(np.float64))
                out.append(
                    {
                        "image_id": image_id,
                        "fmt": fmt,
                        "exact": bool(np.array_equal(ref, arr)),
                        "psnr_db": float(min(p, 1e6)),
                        "lossless": lossless_ref,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema="image_id string, fmt string, exact boolean, psnr_db double, lossless boolean"
    )
