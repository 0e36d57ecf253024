"""Generator-truth reference results for pixel-valued driver oracles.

The q40/q43 oracles already cross the encode/PARSE boundary by materializing
the generator's declared metadata for DuckDB.  This module extends the same
idea to pixel VALUES: every result here is computed from
``synthetic.make_image_truth`` — the pre-encode array the generator drew
(plus the value-level qlossy quantization mirror) — and single-process
numpy reductions.  No mini-raster container, no codec, no CachedReader, no
Spark: when the driver diffs a Spark query against a parquet written from
these frames, the comparison crosses the whole encode -> header-parse ->
tile-decode -> distributed-join stack instead of reusing any of it.

Shared with the engine are only the deterministic coordinate/geometry
kernels (window math, CRS transforms, even-odd PIP) — the same status the
reference gives rasterio/shapely in its own fixture oracles
(`/root/reference/tests/test_dataset_pixel_comparison.py`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rasteret_spark import crs, geom
from rasteret_spark.operators.decode import (
    pixel_axes_lonlat,
    pixel_centers_lonlat,
    window_from_bbox,
)
from rasteret_spark.sources import synthetic as syn

_INT32 = ["band", "win_col", "win_row", "win_w", "win_h"]
_INT64 = ["px_count", "valid_count"]
_FLOAT = ["v_sum", "v_mean", "v_min", "v_max"]


def _image_sidecar(i: int, seed: int = 42) -> dict:
    """Truth dict for image ``i`` plus the lon/lat footprint bbox and caption
    (same corner math / caption formula as ``make_image_row``, re-derived
    here without touching the encoded blob)."""
    t = syn.make_image_truth(i, seed)
    sx, _, x0, _, sy, y0 = t["transform"]
    w, h = t["w"], t["h"]
    cols = np.array([0.0, w, w, 0.0])
    rows = np.array([0.0, 0.0, h, h])
    lons, lats = crs.to_lonlat(t["epsg"], sx * cols + x0, sy * rows + y0)
    footprint = geom.wkb_polygon([np.column_stack([lons, lats])])
    xmin, ymin, xmax, ymax = geom.wkb_bbox(footprint)
    src_i = t["src_i"]
    if src_i % 23 == 11:
        caption = ""
    else:
        widx = [(src_i * 7 + k * 13) % len(syn._CAPTION_WORDS) for k in range(3)]
        caption = " ".join(syn._CAPTION_WORDS[j] for j in widx) + f" #{src_i}"
    t.update(
        image_id=f"img-{i:08d}",
        caption=caption,
        xmin=xmin,
        ymin=ymin,
        xmax=xmax,
        ymax=ymax,
    )
    return t


def _zonal_truth_row(t: dict, aoi: dict, band: int) -> dict:
    """Mirror of the zonal kernel's per-(aoi, band) record over the truth
    array (`operators/decode.py:353-420` semantics, numpy single-process)."""
    bx0, by0, bx1, by1 = crs.bbox_from_lonlat(
        t["epsg"],
        float(aoi["xmin"]), float(aoi["ymin"]),
        float(aoi["xmax"]), float(aoi["ymax"]),
    )
    c0, r0, ww, wh = window_from_bbox(
        t["transform"], t["w"], t["h"], bx0, by0, bx1, by1
    )
    rec = {
        "image_id": t["image_id"],
        "aoi_id": aoi["aoi_id"],
        "band": band,
        "caption": t["caption"],
        "win_col": c0, "win_row": r0, "win_w": ww, "win_h": wh,
        "px_count": 0, "valid_count": 0,
        "v_sum": None, "v_mean": None, "v_min": None, "v_max": None,
        "status": "ok",
    }
    if ww <= 0 or wh <= 0:
        return rec
    wkb = bytes(aoi["geometry"])
    if crs.is_separable(t["epsg"]):
        lon, lat = pixel_axes_lonlat(t["transform"], t["epsg"], c0, r0, ww, wh)
        inside = geom.points_in_polygon_grid(lon, lat, wkb)
    else:
        glon, glat = pixel_centers_lonlat(t["transform"], t["epsg"], c0, r0, ww, wh)
        inside = geom.points_in_polygon_wkb(glon.ravel(), glat.ravel(), wkb).reshape(wh, ww)
    arr = t["expected"][band, r0 : r0 + wh, c0 : c0 + ww]
    valid = inside
    if t["nodata"] is not None:
        if np.isnan(t["nodata"]):
            valid = valid & ~np.isnan(arr.astype(np.float64))
        else:
            valid = valid & (arr != np.asarray(t["nodata"]).astype(arr.dtype))
    v = arr[valid].astype(np.float64)
    rec.update(
        px_count=int(inside.sum()),
        valid_count=int(v.size),
        v_sum=float(v.sum()) if v.size else None,
        v_mean=float(v.mean()) if v.size else None,
        v_min=float(v.min()) if v.size else None,
        v_max=float(v.max()) if v.size else None,
    )
    return rec


def zonal_truth_pdf(
    n_images: int = 120,
    n_aois: int = 40,
    seed: int = 42,
    bands: tuple[int, ...] = (0,),
) -> pd.DataFrame:
    """Expected output of the zonal query (brute-force pair enumeration +
    truth-array masking) with the engine's exact column dtypes."""
    aois = syn.aois_table(n_aois, seed).to_pylist()
    rows: list[dict] = []
    for i in range(n_images):
        t = _image_sidecar(i, seed)
        for aoi in aois:
            if not (
                t["xmax"] >= aoi["xmin"]
                and t["xmin"] <= aoi["xmax"]
                and t["ymax"] >= aoi["ymin"]
                and t["ymin"] <= aoi["ymax"]
            ):
                continue
            if not geom.rect_intersects_polygon(
                t["xmin"], t["ymin"], t["xmax"], t["ymax"], bytes(aoi["geometry"])
            ):
                continue
            for band in bands:
                if band < t["n_bands"]:
                    rows.append(_zonal_truth_row(t, aoi, band))
    pdf = pd.DataFrame(rows)
    for c in _INT32:
        pdf[c] = pdf[c].astype("int32")
    for c in _INT64:
        pdf[c] = pdf[c].astype("int64")
    for c in _FLOAT:
        pdf[c] = pdf[c].astype("float64")
    return pdf


def psnr_truth_pdf(n: int = 120, seed: int = 42) -> pd.DataFrame:
    """Expected output of the fidelity query: per image, whether the decode
    should be bit-exact vs the drawn array, and the PSNR it should land on
    (lossless -> exact, capped-inf PSNR; qlossy -> the quantization's PSNR)."""
    from rasteret_spark.format.codecs import psnr

    rows = []
    for i in range(n):
        t = syn.make_image_truth(i, seed)
        lossless = t["fmt"] not in ("qlossy",)
        p = psnr(t["arr"].astype(np.float64), t["expected"].astype(np.float64))
        rows.append(
            {
                "image_id": f"img-{i:08d}",
                "fmt": t["fmt"],
                "exact": bool(np.array_equal(t["arr"], t["expected"])),
                "psnr_db": float(min(p, 1e6)),
                "lossless": lossless,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["psnr_db"] = pdf["psnr_db"].astype("float64")
    return pdf
