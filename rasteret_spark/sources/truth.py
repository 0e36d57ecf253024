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
    """Truth dict for image ``i`` plus the lon/lat footprint bbox, caption
    and timestamp (same corner math / caption / epoch formulas as
    ``make_image_row``, re-derived here without touching the encoded blob)."""
    import datetime as dt

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
        datetime=dt.datetime(2023, 1, 1)
        + dt.timedelta(hours=float((src_i * 37) % (2 * 365 * 24)), minutes=float(i % 60)),
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


def _sample_truth_rows(t: dict, pts: list[dict], max_ring: int, band: int) -> list[dict]:
    """Mirror of the point sampler's per-(image, band) records over the truth
    array (`operators/sampling.py:186-262` semantics) — but the ring fallback
    is a BRUTE-FORCE scan of the full Chebyshev window (all pixels within
    ``max_ring``), not the engine's incremental ring walk with early-retire
    certification, so selection bugs in either implementation can't hide."""
    sx, _, x0, _, sy, y0 = t["transform"]
    w, h = t["w"], t["h"]
    arr = t["expected"][band]
    nod = t["nodata"]
    xs, ys = crs.from_lonlat(
        t["epsg"],
        np.asarray([p["x"] for p in pts], dtype=float),
        np.asarray([p["y"] for p in pts], dtype=float),
    )
    fcols = (np.atleast_1d(xs) - x0) / sx
    frows = (np.atleast_1d(ys) - y0) / sy
    out = []
    for j, p in enumerate(pts):
        col, row = int(np.floor(fcols[j])), int(np.floor(frows[j]))
        in_b = 0 <= col < w and 0 <= row < h
        value = float(arr[row, col]) if in_b else np.nan
        valid = in_b and (nod is None or value != nod)
        ring_steps, s_col, s_row = 0, col if in_b else -1, row if in_b else -1
        if max_ring > 0 and nod is not None and in_b and not valid:
            best = None  # (d2, r, c, v) lexicographic over the whole window
            for r in range(max(0, row - max_ring), min(h, row + max_ring + 1)):
                for c in range(max(0, col - max_ring), min(w, col + max_ring + 1)):
                    if r == row and c == col:
                        continue
                    v = float(arr[r, c])
                    if np.isnan(v) or (np.isnan(nod) and np.isnan(v)) or v == nod:
                        continue
                    d2 = (r + 0.5 - frows[j]) ** 2 + (c + 0.5 - fcols[j]) ** 2
                    if best is None or (d2, r, c) < best[:3]:
                        best = (d2, r, c, v)
            if best is not None:
                _, br, bc, bv = best
                value, valid = bv, True
                ring_steps = max(abs(br - row), abs(bc - col))
                s_row, s_col = br, bc
        out.append(
            {
                "point_index": p["point_index"],
                "image_id": t["image_id"],
                "band": band,
                "px_col": col,
                "px_row": row,
                "in_bounds": in_b,
                "value": None if np.isnan(value) else value,
                "valid": bool(valid),
                "ring_steps": ring_steps,
                "sample_col": s_col,
                "sample_row": s_row,
                "status": "ok",
            }
        )
    return out


def sample_truth_pdf(
    n_images: int = 120,
    n_points: int = 200,
    max_ring: int = 4,
    seed: int = 42,
    bands: tuple[int, ...] = (0,),
    latest_only: bool = False,
) -> pd.DataFrame:
    """Expected output of the point-sample queries: brute-force candidate
    enumeration (inclusive bbox containment, `spatial_join.py:157-188`
    predicate), optional latest-per-point winner dedup (max datetime, tie ->
    min image_id — `asof.latest_per_key` semantics), then truth-array
    sampling with brute-force ring fallback."""
    pts = syn.points_table(n_points, seed).to_pylist()
    sidecars = [_image_sidecar(i, seed) for i in range(n_images)]
    pairs: dict[str, list[dict]] = {}  # image_id -> candidate points
    if latest_only:
        for p in pts:
            best = None
            for t in sidecars:
                if t["xmin"] <= p["x"] <= t["xmax"] and t["ymin"] <= p["y"] <= t["ymax"]:
                    # newest first; ties -> lexicographically smallest id
                    k = (t["datetime"], _NegStr(t["image_id"]))
                    if best is None or k > best[0]:
                        best = (k, t)
            if best is not None:
                pairs.setdefault(best[1]["image_id"], []).append(p)
    else:
        for t in sidecars:
            sel = [
                p
                for p in pts
                if t["xmin"] <= p["x"] <= t["xmax"] and t["ymin"] <= p["y"] <= t["ymax"]
            ]
            if sel:
                pairs[t["image_id"]] = sel
    by_id = {t["image_id"]: t for t in sidecars}
    rows: list[dict] = []
    for image_id, sel in pairs.items():
        t = by_id[image_id]
        for band in bands:
            if band < t["n_bands"]:
                rows.extend(_sample_truth_rows(t, sel, max_ring, band))
    pdf = pd.DataFrame(rows)
    pdf["point_index"] = pdf["point_index"].astype("int64")
    for c in ("band", "px_col", "px_row", "ring_steps", "sample_col", "sample_row"):
        pdf[c] = pdf[c].astype("int32")
    pdf["value"] = pdf["value"].astype("float64")
    for c in ("in_bounds", "valid"):
        pdf[c] = pdf[c].astype(bool)
    return pdf


class _NegStr:
    """Inverts string comparison so 'max of (datetime, _NegStr(id))' picks the
    newest datetime and, on ties, the SMALLEST image_id."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __lt__(self, other: "_NegStr") -> bool:
        return self.s > other.s

    def __gt__(self, other: "_NegStr") -> bool:
        return self.s < other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _NegStr) and self.s == other.s


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
