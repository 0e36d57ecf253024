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
from rasteret_spark.format import container
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


def _err_status(e: BaseException) -> str:
    """Compact per-row error label for quarantine rows (bounded length so a
    pathological message can't bloat the output)."""
    return f"{type(e).__name__}: {e}"[:200]


# --- per-image full decode stats (flagship decode benchmark stage) ------------
IMAGE_STATS_SCHEMA = (
    "image_id string, fmt string, caption string, width int, height int, "
    "px_count bigint, valid_count bigint, v_mean double, v_min double, v_max double, "
    "status string"
)


def decode_image_stats(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Decode every image fully (all tiles via coalesced range reads) and emit
    per-image pixel stats.  Input needs columns: image_id, bytes, fmt, caption."""
    cols = ["image_id", "bytes", "fmt", "caption"]
    df = df.repartition(_decode_parallelism(df, parallelism), "image_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt, caption in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"]
            ):
                try:
                    blob = bytes(blob)
                    meta = container.parse_any(blob)
                    arr = container.decode_full_any(blob)  # (h,w) or (bands,h,w)
                    vals = arr.astype(np.float64)
                    valid = np.ones(arr.shape, dtype=bool)
                    if meta.nodata is not None:
                        valid = vals != meta.nodata
                        if np.isnan(meta.nodata):
                            valid = ~np.isnan(vals)
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
                            "status": "ok",
                        }
                    )
                except Exception as e:  # quarantine row, not a task failure
                    out.append(
                        {
                            "image_id": image_id,
                            "fmt": fmt,
                            "caption": caption,
                            "width": None,
                            "height": None,
                            "px_count": 0,
                            "valid_count": 0,
                            "v_mean": None,
                            "v_min": None,
                            "v_max": None,
                            "status": _err_status(e),
                        }
                    )
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


# --- zonal extraction (AOI x image join rows -> masked stats) ------------------
ZONAL_SCHEMA = (
    "image_id string, aoi_id string, band int, caption string, "
    "win_col int, win_row int, win_w int, win_h int, "
    "px_count bigint, valid_count bigint, "
    "v_sum double, v_mean double, v_min double, v_max double, status string"
)


def pixel_axes_lonlat(
    transform: tuple[float, ...], epsg: int, col_off: int, row_off: int, win_w: int, win_h: int
) -> tuple[np.ndarray, np.ndarray]:
    """1-D lon (per column) and lat (per row) of pixel centers — exact for the
    engine's axis-aligned linear CRS registry (separable transform)."""
    a, _, c, _, e, f = transform
    xs = a * (col_off + np.arange(win_w) + 0.5) + c
    ys = e * (row_off + np.arange(win_h) + 0.5) + f
    lon, _ = crs.to_lonlat(epsg, xs, np.zeros_like(xs))
    _, lat = crs.to_lonlat(epsg, np.zeros_like(ys), ys)
    return lon, lat


BROADCAST_PAIRS_CONF = "spark.rasteret.broadcastPairsLimit"
# pair structs are ~32-60 bytes (point probes) to ~400 bytes (AOI+WKB), so
# 20M pairs is roughly 0.6-8 GB of broadcast — fine for the default 24g
# driver, and two orders of magnitude below the 10^9-pair regime where the
# shuffle join is the only sane plan.  Crossing to the shuffle path too
# early is its own scale bug: it puts the BLOBS through a shuffle that the
# broadcast plan avoids entirely (measured 2-3x wall on the 32k sample
# pipeline).  Tune per-deployment via the conf.
BROADCAST_PAIRS_DEFAULT = 20_000_000


def _pairs_limit(spark) -> int:
    try:
        return int(spark.conf.get(BROADCAST_PAIRS_CONF))
    except Exception:
        return BROADCAST_PAIRS_DEFAULT


def choose_broadcast(pairs: DataFrame, explicit: bool | None) -> bool:
    """Standalone broadcast-vs-shuffle guard over a pair DataFrame: bounded
    by conf ``spark.rasteret.broadcastPairsLimit`` (default 20M pairs,
    ``BROADCAST_PAIRS_DEFAULT``).  Uses ``limit(n+1).count()`` so the scan
    short-circuits at the bound.  ``explicit`` (True/False) overrides."""
    if explicit is not None:
        return explicit
    limit = _pairs_limit(pairs.sparkSession)
    return pairs.limit(limit + 1).count() <= limit


# persisted grouped sides from auto-mode decisions, released on the next
# auto-mode call (by then the previous plan has been consumed in any
# straight-line pipeline) or explicitly via release_grouped_caches()
_GROUPED_CACHES: list[DataFrame] = []


def release_grouped_caches() -> None:
    """Unpersist every grouped side cached by auto-mode decisions.  Call
    after the consuming action when the session is long-lived (bench loops,
    services); idempotent."""
    while _GROUPED_CACHES:
        try:
            _GROUPED_CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped


def grouped_side_choice(agg: DataFrame, explicit: bool | None, list_col: str):
    """Broadcast-vs-shuffle decision for a grouped probe side WITHOUT
    re-executing the upstream candidate join.

    In auto mode the grouped side is persisted and the decision count is a
    cheap sum of list sizes over the CACHE — the expensive candidate join
    (cell join + exact refine) executes exactly once whichever path wins,
    and the persisted agg is the very thing the winning join then consumes.
    At or below the pair limit (conf ``spark.rasteret.broadcastPairsLimit``,
    default 20M) the grouped side broadcasts (blobs never shuffle); above it
    the plan switches to a shuffle join on image_id, which scales to 10^9+
    pairs where an unconditional broadcast would blow the driver.

    Cache lifecycle: the persisted side is registered and released on the
    NEXT auto-mode call (or explicitly via ``release_grouped_caches``), so a
    session never accumulates more than one live grouped cache.  Building
    two auto-mode plans before collecting either is still correct — the
    first just recomputes its grouped side if its cache was released.
    Returns (agg, use_broadcast)."""
    if explicit is not None:
        return agg, explicit
    limit = _pairs_limit(agg.sparkSession)
    release_grouped_caches()
    agg = agg.persist()
    _GROUPED_CACHES.append(agg)
    n_pairs = agg.select(F.sum(F.size(F.col(list_col)))).first()[0] or 0
    return agg, int(n_pairs) <= limit


def _decode_parallelism(df: DataFrame, parallelism: int | None) -> int:
    """Decode stages are compute-bound, not byte-bound: AQE's size-based
    partition coalescing would pack a whole image table (tiny in bytes,
    heavy in CPU) onto a couple of tasks.  Pin an explicit hash repartition
    so every core decodes."""
    if parallelism is not None:
        return parallelism
    return df.sparkSession.sparkContext.defaultParallelism * 2


def zonal_stats(
    pairs: DataFrame,
    images: DataFrame,
    parallelism: int | None = None,
    broadcast_pairs: bool | None = None,
    bands: tuple[int, ...] | list[int] | None = None,
) -> DataFrame:
    """Zonal extraction with scale-aware dataflow.

    ``pairs`` is the refined candidate set carrying LIGHT columns only
    (image_id, aoi_id, aoi_geometry WKB + aoi bbox) — blobs never ride
    through the cell-join shuffles.  The plan:

      pairs.groupBy(image_id).collect_list(aoi struct)     -- small shuffle
        JOIN images(image_id, bytes, caption)              -- each blob moves
                                                              at most once
        mapInPandas: per image, ONE CachedReader shares tile decodes across
        all its AOIs; masking is the scanline grid PIP (bit-identical to the
        generic ray-cast kernel).

    This mirrors rasteret's per-record multi-geometry read loop
    (`src/rasteret/core/execution.py:244-297`) in distributed form.
    """
    agg = pairs.groupBy("image_id").agg(
        F.collect_list(
            F.struct("aoi_id", "aoi_geometry", "aoi_xmin", "aoi_ymin", "aoi_xmax", "aoi_ymax")
        ).alias("_aois")
    )
    has_meta = "meta" in images.columns
    has_bytes = "bytes" in images.columns
    # remote mode: an href column (and no bytes) reads every window through
    # ranged fetches — header prefix + coalesced tile ranges only, nothing
    # downloads whole (the reference's COG access pattern; with pre-enriched
    # ``meta`` the header reads disappear too)
    payload_col = "bytes" if has_bytes else "href"
    if payload_col not in images.columns:
        raise ValueError("images needs a 'bytes' or 'href' column")
    cols = ["image_id", payload_col, "caption"] + (["meta"] if has_meta else [])
    if not has_bytes:
        from rasteret_spark.sources.fetch import _RANGED_READERS

        # snapshot at plan build: driver-registered schemes travel by
        # closure (executors import this module fresh)
        ranged_readers = dict(_RANGED_READERS)
    agg, use_broadcast = grouped_side_choice(agg, broadcast_pairs, "_aois")
    if use_broadcast:
        # the grouped AOI side is small next to the blobs (size-guarded):
        # broadcast it so the decode fuses with the image scan — blobs NEVER
        # shuffle.  Above the pair bound the plan switches to the shuffle
        # join below automatically.
        src = images.select(*cols).join(F.broadcast(agg), "image_id")
    else:
        src = images.select(*cols).join(agg, "image_id")
        src = src.repartition(_decode_parallelism(src, parallelism), "image_id")

    want_bands = tuple(bands) if bands is not None else (0,)

    def _quarantine(image_id, caption, aois, bands, e) -> list[dict]:
        """One status row per planned (aoi, requested band) work unit — a
        corrupt blob yields data rows, never a task failure (the reference's
        per-record failure collection, `src/rasteret/core/execution.py:274-297`)."""
        msg = _err_status(e)
        return [
            {
                "image_id": image_id, "aoi_id": aoi["aoi_id"], "band": band,
                "caption": caption,
                "win_col": None, "win_row": None, "win_w": None, "win_h": None,
                "px_count": 0, "valid_count": 0,
                "v_sum": None, "v_mean": None, "v_min": None, "v_max": None,
                "status": msg,
            }
            for aoi in aois
            for band in bands
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            metas = pdf["meta"] if has_meta else [None] * len(pdf)
            for image_id, blob, caption, aois, meta_row in zip(
                pdf["image_id"], pdf[payload_col], pdf["caption"], pdf["_aois"], metas
            ):
                try:
                    meta = mr.MiniRasterMeta.from_row(meta_row) if meta_row is not None else None
                    if not has_bytes:  # href row -> lazy ranged-fetch facade
                        from rasteret_spark.sources.fetch import RangedBlob

                        blob = RangedBlob(str(blob), ranged_readers)
                    else:
                        blob = bytes(blob)
                    reader = mr.CachedReader(blob, meta)
                    meta = reader.meta
                    img_bands = [b for b in want_bands if b < meta.n_bands]
                except Exception as e:  # header/blob-level failure
                    out.extend(_quarantine(image_id, caption, aois, want_bands, e))
                    continue
                for aoi in aois:
                    try:
                        bx0, by0, bx1, by1 = crs.bbox_from_lonlat(
                            meta.epsg,
                            float(aoi["aoi_xmin"]), float(aoi["aoi_ymin"]),
                            float(aoi["aoi_xmax"]), float(aoi["aoi_ymax"]),
                        )
                        c0, r0, ww, wh = window_from_bbox(
                            meta.transform, meta.width, meta.height, bx0, by0, bx1, by1
                        )
                        inside = None
                        if ww > 0 and wh > 0:
                            if crs.is_separable(meta.epsg):
                                lon, lat = pixel_axes_lonlat(
                                    meta.transform, meta.epsg, c0, r0, ww, wh
                                )
                                inside = geom.points_in_polygon_grid(
                                    lon, lat, bytes(aoi["aoi_geometry"])
                                )
                            else:
                                # non-separable CRS (real Transverse Mercator):
                                # lat varies along a pixel row, so the scanline
                                # grid PIP does not apply — full-grid centers +
                                # the generic even-odd kernel
                                glon, glat = pixel_centers_lonlat(
                                    meta.transform, meta.epsg, c0, r0, ww, wh
                                )
                                inside = geom.points_in_polygon_wkb(
                                    glon.ravel(), glat.ravel(),
                                    bytes(aoi["aoi_geometry"]),
                                ).reshape(wh, ww)
                        for band in img_bands:
                            rec = {
                                "image_id": image_id,
                                "aoi_id": aoi["aoi_id"],
                                "band": band,
                                "caption": caption,
                                "win_col": c0, "win_row": r0, "win_w": ww, "win_h": wh,
                                "px_count": 0, "valid_count": 0,
                                "v_sum": None, "v_mean": None, "v_min": None, "v_max": None,
                                "status": "ok",
                            }
                            if inside is not None:
                                arr = reader.window(c0, r0, ww, wh, band=band)
                                valid = inside
                                if meta.nodata is not None:
                                    # exact equality — nodata masking parity with
                                    # the reference (mask = arr == nodata);
                                    # NaN nodata needs isnan (NaN != NaN keeps all)
                                    if np.isnan(meta.nodata):
                                        valid = valid & ~np.isnan(arr.astype(np.float64))
                                    else:
                                        valid = valid & (
                                            arr != np.asarray(meta.nodata).astype(arr.dtype)
                                        )
                                v = arr[valid].astype(np.float64)
                                rec.update(
                                    px_count=int(inside.sum()),
                                    valid_count=int(v.size),
                                    v_sum=float(v.sum()) if v.size else None,
                                    v_mean=float(v.mean()) if v.size else None,
                                    v_min=float(v.min()) if v.size else None,
                                    v_max=float(v.max()) if v.size else None,
                                )
                            out.append(rec)
                    except Exception as e:  # tile/window-level failure: this AOI only
                        out.extend(_quarantine(image_id, caption, [aoi], img_bands, e))
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.split(" ")[0]: [] for f in ZONAL_SCHEMA.split(", ")}
            )

    return src.mapInPandas(run, schema=ZONAL_SCHEMA)


# --- driver-side single-process oracle (tests) ---------------------------------
def zonal_oracle_row(image_row: dict, aoi_row: dict, band: int = 0) -> dict:
    """Independent oracle: decode the FULL image (no window path), mask, reduce.

    Used by tests to pin the Spark pipeline bit-for-bit (the reference pins
    its reads against rasterio the same way,
    `tests/test_dataset_pixel_comparison.py`)."""
    blob = image_row["bytes"]
    meta = container.parse_any(blob)
    arr = container.decode_full_any(blob, band=band)
    lon, lat = pixel_centers_lonlat(meta.transform, meta.epsg, 0, 0, meta.width, meta.height)
    inside = geom.points_in_polygon_wkb(
        lon.ravel(), lat.ravel(), aoi_row["geometry"]
    ).reshape(meta.height, meta.width)
    vals = arr.astype(np.float64)
    valid = inside
    if meta.nodata is not None:
        if np.isnan(meta.nodata):
            valid = valid & ~np.isnan(vals)
        else:
            valid = valid & (vals != meta.nodata)
    v = vals[valid]
    return {
        "image_id": image_row["image_id"],
        "aoi_id": aoi_row["aoi_id"],
        "band": band,
        "px_count": int(inside.sum()),
        "valid_count": int(v.size),
        "v_sum": float(v.sum()) if v.size else None,
        "v_mean": float(v.mean()) if v.size else None,
        "v_min": float(v.min()) if v.size else None,
        "v_max": float(v.max()) if v.size else None,
    }


def psnr_check(df: DataFrame) -> DataFrame:
    """Per-image decoded-pixel fidelity vs the PRE-ENCODE original (the
    array the generator drew, regenerated without any codec in the loop) —
    drives the PSNR>=40dB gate for lossy formats and the bit-exact gate for
    lossless ones.  Input columns: image_id, bytes, fmt + a regenerate key
    (image index from image_id)."""
    from rasteret_spark.format import codecs
    from rasteret_spark.sources import synthetic as syn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                arr = mr.decode_full(bytes(blob))
                if arr.ndim == 2:
                    arr = arr[None]
                i = int(image_id.split("-")[1])
                ref = syn.make_image_truth(i)["arr"]
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

    df = df.select("image_id", "bytes", "fmt")
    df = df.repartition(_decode_parallelism(df, None), "image_id")
    return df.mapInPandas(
        run, schema="image_id string, fmt string, exact boolean, psnr_db double, lossless boolean"
    )
