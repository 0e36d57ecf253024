"""Minimal (Geo)TIFF / BigTIFF writer.

The encode direction of ``format/tiff.py`` — used to materialize synthetic
GeoTIFF-backed image tables for tests/benchmarks and as the independent
partner implementation in the round-trip matrix (the writer composes IFDs
from the spec; the reader walks them — a bug in shared logic cannot cancel
out because there is none).

Scope: tiled or stripped; classic or BigTIFF; little or big endian; the
codecs the engine decodes (none/deflate/packbits/LZW); predictors 1/2/3;
single-band (h, w), planar multi-band (bands, h, w) or interleaved chunky
(h, w, spp) layouts; ModelPixelScale+Tiepoint georeferencing, GeoKey CRS +
raster type, GDAL_NODATA.  The reference has no TIFF writer (it is a
reader of COGs others produce); this exists for the engine's own testing
and sink parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from rasteret_spark.format import codecs
from rasteret_spark.format import tiff as tf

_DTYPE_SF = {  # numpy kind -> TIFF SampleFormat
    "u": 1, "i": 2, "f": 3,
}

_COMP_IDS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773, "jpeg": 7,
             "zstd": 50000, "lerc": 34887, "lzma": 34925}


def _pred_bytes(tile: np.ndarray, predictor: int, order: str) -> bytes:
    """Predictor-transform one (h, w) native-order tile and serialize in the
    file byte order."""
    dt = tile.dtype
    stored = dt.newbyteorder(order)
    if predictor == 1:
        return np.ascontiguousarray(tile.astype(stored)).tobytes()
    if predictor == 2:
        if dt.kind == "f":  # bit-pattern differencing (see codecs)
            iv = np.ascontiguousarray(tile).view(f"u{dt.itemsize}")
            d = iv.copy()
            d[:, 1:] = iv[:, 1:] - iv[:, :-1]
            return d.astype(f"{order}u{dt.itemsize}").tobytes()
        d = tile.copy()
        d[:, 1:] = tile[:, 1:] - tile[:, :-1]
        return d.astype(stored).tobytes()
    if predictor == 3:
        # byte planes of the big-endian representation — independent of the
        # file's sample byte order by construction
        return codecs.apply_predictor(tile, codecs.PRED_FLOAT)
    raise ValueError(f"unknown predictor {predictor}")


def _compress(raw: bytes, comp_id: int) -> bytes:
    if comp_id == 1:
        return raw
    if comp_id == 5:
        return codecs.lzw_encode(raw)
    if comp_id == 8:
        return zlib.compress(raw, 6)
    if comp_id == 32773:
        return codecs.packbits_encode(raw)
    if comp_id == 34925:  # LZMA2 (GDAL extension)
        import lzma

        return lzma.compress(raw, preset=1)
    if comp_id == 50000:  # GDAL zstd (format/zstd.py, RFC 8878)
        from rasteret_spark.format import zstd

        # the PURE encoder, deliberately: compress_fast delegates to
        # whatever libzstd is installed, so its bytes vary by library
        # presence/version — generator_fingerprint keys blob caches on
        # SOURCE hashes and the synthetic tables must be byte-deterministic
        # everywhere.  Entropy-coded frames are exercised by the reference
        # fixture + libzstd cross-tests in tests/test_zstd.py.
        return zstd.compress(raw)
    raise ValueError(f"unsupported compression id {comp_id}")


def _tile_payload(tile: np.ndarray, comp_id: int, predictor: int, order: str) -> bytes:
    if comp_id == 34887:  # LERC works on samples, not a predictor byte stream
        from rasteret_spark.format import lerc

        # the PURE encoder (see the zstd note above): deterministic bytes
        # regardless of libLerc presence/version
        return lerc.encode(tile)
    return _compress(_pred_bytes(tile, predictor, order), comp_id)


def write_tiff(
    arr: np.ndarray,
    *,
    tile: tuple[int, int] | None = None,
    rows_per_strip: int | None = None,
    compression: str = "none",
    predictor: int = 1,
    byte_order: str = "<",
    bigtiff: bool = False,
    interleaved: bool = False,
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, float] | None = None,
    epsg: int | None = None,
    raster_type: int = 1,
    nodata: float | None = None,
    overviews: list[int] | tuple[int, ...] | None = None,
    jpeg_quality: int = 90,
    jpeg_tables_mode: int = 0,
) -> bytes:
    """Serialize ``arr`` as a TIFF blob.

    ``arr``: (h, w) single band; (bands, h, w) planar; (h, w, spp) with
    ``interleaved=True`` for chunky.  ``tile=(tw, th)`` writes a tiled
    layout (edge tiles padded); otherwise strips of ``rows_per_strip``
    (default: whole image, final strip short).  ``tiepoint`` georeferences
    pixel (0, 0)'s upper-left corner (or center when ``raster_type=2``).

    ``overviews=[2, 4, ...]`` appends a COG-style reduced-resolution
    pyramid: one extra IFD per decimation factor (nearest-neighbour
    ``arr[::f, ::f]``), chained through next-IFD pointers and flagged
    ``NewSubfileType=1``; geo/nodata tags live on the full-resolution IFD
    only (GDAL convention)."""
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    comp_id = _COMP_IDS.get(compression)
    if comp_id is None:
        raise ValueError(f"unsupported compression {compression!r}")
    arr = np.asarray(arr)
    dt = arr.dtype
    if dt.kind not in _DTYPE_SF:
        raise ValueError(f"unsupported dtype {dt}")
    if predictor == 3 and dt.kind != "f":
        raise ValueError("predictor 3 requires float samples")
    if comp_id == 7:  # new-style JPEG (baseline, 8-bit)
        if dt != np.uint8:
            raise ValueError("JPEG compression requires uint8 samples")
        if predictor != 1:
            raise ValueError("JPEG compression does not take a predictor")
        if jpeg_tables_mode not in (0, 1):
            raise ValueError("jpeg_tables_mode must be 0 (self-contained "
                             "streams) or 1 (shared JPEGTables tag)")
    if comp_id == 34887:  # Esri LERC2
        if predictor != 1:
            raise ValueError("LERC compression does not take a predictor")
        if dt.itemsize == 2 and dt.kind == "f":
            raise ValueError("LERC has no float16 sample type")
        if interleaved:
            raise ValueError(
                "chunky LERC writes (nDepth>1) are not supported; write "
                "planar bands (reads of GDAL chunky LERC go through libLerc)"
            )

    def decimate(a: np.ndarray, f: int) -> np.ndarray:
        if interleaved:
            return a[::f, ::f, :]
        if a.ndim == 3:  # planar (bands, h, w)
            return a[:, ::f, ::f]
        return a[::f, ::f]

    levels = [arr] + [decimate(arr, int(f)) for f in (overviews or [])]

    E = byte_order
    order_mark = b"II" if E == "<" else b"MM"
    if bigtiff:
        header = order_mark + struct.pack(f"{E}HHHQ", 43, 8, 0, 16)
        entry_size, count_size, next_size, inline_cap = 20, 8, 8, 8
        off_fmt = "Q"
    else:
        header = order_mark + struct.pack(f"{E}HI", 42, 8)
        entry_size, count_size, next_size, inline_cap = 12, 2, 4, 4
        off_fmt = "I"

    segments: list[bytes] = []
    next_field_positions: list[int] = []  # absolute file offset of each
    ifd_bases: list[int] = []             # segment's next-IFD pointer field
    base = len(header)
    for li, lv in enumerate(levels):
        seg, next_pos = _ifd_segment(
            lv, base, E, bigtiff, entry_size, count_size, next_size,
            inline_cap, off_fmt, comp_id=comp_id, predictor=predictor,
            jpeg_quality=jpeg_quality, jpeg_tables_mode=jpeg_tables_mode,
            interleaved=interleaved, tile=tile, rows_per_strip=rows_per_strip,
            pixel_scale=pixel_scale if li == 0 else None,
            tiepoint=tiepoint if li == 0 else None,
            epsg=epsg if li == 0 else None,
            raster_type=raster_type if li == 0 else 1,
            nodata=nodata if li == 0 else None,
            is_overview=li > 0,
        )
        if len(seg) % 2:  # TIFF 6.0: directories begin on a word boundary
            seg += b"\x00"
        ifd_bases.append(base)
        next_field_positions.append(base + next_pos)
        segments.append(seg)
        base += len(seg)

    blob = bytearray(header + b"".join(segments))
    for i in range(len(segments) - 1):  # chain the pyramid
        struct.pack_into(f"{E}{off_fmt}", blob, next_field_positions[i],
                         ifd_bases[i + 1])
    return bytes(blob)


def _ifd_segment(
    arr: np.ndarray,
    base: int,
    E: str,
    bigtiff: bool,
    entry_size: int,
    count_size: int,
    next_size: int,
    inline_cap: int,
    off_fmt: str,
    *,
    comp_id: int,
    predictor: int,
    jpeg_quality: int = 90,
    jpeg_tables_mode: int = 0,
    interleaved: bool,
    tile: tuple[int, int] | None,
    rows_per_strip: int | None,
    pixel_scale,
    tiepoint,
    epsg,
    raster_type: int,
    nodata,
    is_overview: bool,
) -> tuple[bytes, int]:
    """One complete IFD segment ([IFD block][overflow values][payloads]) laid
    out at absolute file offset ``base``.  Returns (bytes, relative offset of
    the next-IFD pointer field) — the caller chains segments by patching
    those fields once every segment's size is known."""
    dt = arr.dtype
    if interleaved:
        h, w, spp = arr.shape
        planar_cfg, planes = 1, None
    elif arr.ndim == 3:
        spp, h, w = arr.shape
        planar_cfg, planes = 2, [arr[b] for b in range(spp)]
    else:
        h, w = arr.shape
        spp, planar_cfg, planes = 1, 1, [arr]

    if tile is not None:
        tw, th = tile
        tiled = True
    else:
        tw = w
        th = min(rows_per_strip or h, h)
        tiled = False
    tiles_x = -(-w // tw)
    tiles_y = -(-h // th)

    def cut(plane: np.ndarray, ty: int, tx: int) -> np.ndarray:
        y0, x0 = ty * th, tx * tw
        blk = plane[y0 : min(y0 + th, h), x0 : min(x0 + tw, w)]
        if tiled:  # tiles pad to full size; strips stay short
            out = np.zeros((th, tw), dtype=dt)
            out[: blk.shape[0], : blk.shape[1]] = blk
            return out
        return np.ascontiguousarray(blk)

    jpeg_self_contained = comp_id == 7 and jpeg_tables_mode == 0

    def jpeg_payload(blk: np.ndarray) -> bytes:
        from rasteret_spark.format import jpegcodec

        return jpegcodec.encode(
            blk, quality=jpeg_quality, include_tables=jpeg_self_contained
        )

    payloads: list[bytes] = []
    if comp_id == 7:
        if interleaved:
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    y0, x0 = ty * th, tx * tw
                    blk = arr[y0 : min(y0 + th, h), x0 : min(x0 + tw, w), :]
                    if tiled:
                        full = np.zeros((th, tw, spp), dtype=dt)
                        full[: blk.shape[0], : blk.shape[1]] = blk
                        blk = full
                    payloads.append(jpeg_payload(np.ascontiguousarray(blk)))
        else:
            for plane in planes:
                for ty in range(tiles_y):
                    for tx in range(tiles_x):
                        payloads.append(jpeg_payload(cut(plane, ty, tx)))
    elif interleaved:
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                y0, x0 = ty * th, tx * tw
                blk = arr[y0 : min(y0 + th, h), x0 : min(x0 + tw, w), :]
                if tiled:
                    full = np.zeros((th, tw, spp), dtype=dt)
                    full[: blk.shape[0], : blk.shape[1]] = blk
                    blk = full
                bh = blk.shape[0]
                wide = np.ascontiguousarray(blk).reshape(bh, blk.shape[1] * spp)
                if predictor == 2:
                    # per-sample differencing: diff the (h, w, spp) view
                    if dt.kind == "f":
                        iv = np.ascontiguousarray(blk).view(f"u{dt.itemsize}")
                        d = iv.copy()
                        d[:, 1:, :] = iv[:, 1:, :] - iv[:, :-1, :]
                        raw = d.astype(f"{E}u{dt.itemsize}").tobytes()
                    else:
                        d = blk.copy()
                        d[:, 1:, :] = blk[:, 1:, :] - blk[:, :-1, :]
                        raw = d.astype(dt.newbyteorder(E)).tobytes()
                elif predictor == 3:
                    raw = codecs.apply_predictor(wide, codecs.PRED_FLOAT)
                else:
                    raw = wide.astype(dt.newbyteorder(E)).tobytes()
                payloads.append(_compress(raw, comp_id))
    else:
        for plane in planes:
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    payloads.append(
                        _tile_payload(cut(plane, ty, tx), comp_id, predictor, E)
                    )

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, data)

    def add(tag: int, ftype: int, values) -> None:
        if ftype in (2, 7):  # ASCII with NUL / UNDEFINED byte blob
            data = bytes(values)
        else:
            fmt = {1: "B", 3: "H", 4: "I", 12: "d", 16: "Q"}[ftype]
            data = struct.pack(f"{E}{len(values)}{fmt}", *values)
        entries.append((tag, ftype, len(values) if ftype != 2 else len(data), data))

    off_type = 16 if bigtiff else 4  # LONG8 vs LONG for offset arrays
    if is_overview:
        add(254, 4, [1])  # NewSubfileType: reduced-resolution subfile
    add(tf.TAG_WIDTH, 4, [w])
    add(tf.TAG_HEIGHT, 4, [h])
    add(tf.TAG_BITS_PER_SAMPLE, 3, [dt.itemsize * 8] * spp)
    add(tf.TAG_COMPRESSION, 3, [comp_id])
    if comp_id == 7 and interleaved and spp >= 3:
        photometric = 6  # YCbCr: the JPEG streams store transformed samples
    else:
        photometric = 2 if (interleaved and spp >= 3) else 1
    add(tf.TAG_PHOTOMETRIC, 3, [photometric])
    if comp_id == 7 and jpeg_tables_mode == 1:
        from rasteret_spark.format import jpegcodec

        add(tf.TAG_JPEG_TABLES, 7, jpegcodec.encode_tables(
            jpeg_quality, color=interleaved and spp >= 3))
    if comp_id == 34887:
        # GDAL/libtiff convention: (lerc blob version, additional
        # compression) — 0 = the tile bytes are bare Lerc2 blobs
        add(tf.TAG_LERC_PARAMETERS, 4, [4, 0])
    add(tf.TAG_SAMPLES_PER_PIXEL, 3, [spp])
    add(tf.TAG_PLANAR_CONFIG, 3, [planar_cfg])
    if predictor != 1:
        add(tf.TAG_PREDICTOR, 3, [predictor])
    add(tf.TAG_SAMPLE_FORMAT, 3, [_DTYPE_SF[dt.kind]] * spp)
    if tiled:
        add(tf.TAG_TILE_WIDTH, 3, [tw])
        add(tf.TAG_TILE_HEIGHT, 3, [th])
        off_tag, cnt_tag = tf.TAG_TILE_OFFSETS, tf.TAG_TILE_BYTE_COUNTS
    else:
        add(tf.TAG_ROWS_PER_STRIP, 4, [th])
        off_tag, cnt_tag = tf.TAG_STRIP_OFFSETS, tf.TAG_STRIP_BYTE_COUNTS
    # offsets patched in once the data start is known
    n_chunks = len(payloads)
    add(off_tag, off_type, [0] * n_chunks)
    add(cnt_tag, off_type, [len(p) for p in payloads])
    if pixel_scale is not None:
        add(tf.TAG_MODEL_PIXEL_SCALE, 12,
            [float(pixel_scale[0]), float(pixel_scale[1]), 0.0])
    if tiepoint is not None:
        add(tf.TAG_MODEL_TIEPOINT, 12,
            [0.0, 0.0, 0.0, float(tiepoint[0]), float(tiepoint[1]), 0.0])
    geokeys: list[tuple[int, int]] = []
    if raster_type != 1:
        geokeys.append((tf.GKEY_RASTER_TYPE, raster_type))
    if epsg is not None:
        key = (tf.GKEY_GEOGRAPHIC_TYPE if 4000 <= epsg < 5000
               else tf.GKEY_PROJECTED_CS_TYPE)
        geokeys.append((key, epsg))
    if geokeys:
        gk = [1, 1, 0, len(geokeys)]
        for kid, val in sorted(geokeys):
            gk += [kid, 0, 1, val]
        add(tf.TAG_GEO_KEY_DIRECTORY, 3, gk)
    if nodata is not None:
        add(tf.TAG_GDAL_NODATA, 2, f"{nodata:g}".encode() + b"\x00")
    entries.sort(key=lambda t: t[0])

    ifd_size = count_size + len(entries) * entry_size + next_size
    overflow_off = base + ifd_size
    overflow: list[bytes] = []
    cursor = overflow_off
    packed_entries = []
    entry_meta = []  # (tag, ftype, count, data_location) for offset patching
    for tag, ftype, count, data in entries:
        if len(data) <= inline_cap:
            loc = ("inline", len(packed_entries))
            value_field = data + b"\x00" * (inline_cap - len(data))
        else:
            if len(data) % 2:  # TIFF 6.0: out-of-line values word-aligned
                data = data + b"\x00"
            loc = ("overflow", cursor)
            overflow.append(data)
            value_field = struct.pack(f"{E}{off_fmt}", cursor)
            cursor += len(data)
        if bigtiff:
            packed = struct.pack(f"{E}HHQ", tag, ftype, count) + value_field
        else:
            packed = struct.pack(f"{E}HHI", tag, ftype, count) + value_field
        packed_entries.append(packed)
        entry_meta.append((tag, ftype, count, loc))

    data_start = cursor
    offsets = []
    pos = data_start
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    off_i = next(i for i, (tag, *_rest) in enumerate(entry_meta) if tag == off_tag)
    tag, ftype, count, loc = entry_meta[off_i]
    fmt = {4: "I", 16: "Q"}[off_type]
    off_data = struct.pack(f"{E}{len(offsets)}{fmt}", *offsets)
    if loc[0] == "inline":
        value_field = off_data + b"\x00" * (inline_cap - len(off_data))
        if bigtiff:
            packed_entries[off_i] = struct.pack(f"{E}HHQ", tag, ftype, count) + value_field
        else:
            packed_entries[off_i] = struct.pack(f"{E}HHI", tag, ftype, count) + value_field
    else:
        # find which overflow block holds the zeros and replace it
        idx = 0
        run = overflow_off
        for i, blk in enumerate(overflow):
            if run == loc[1]:
                idx = i
                break
            run += len(blk)
        overflow[idx] = off_data

    body = (
        struct.pack(f"{E}{'Q' if bigtiff else 'H'}", len(entries))
        + b"".join(packed_entries)
        + struct.pack(f"{E}{off_fmt}", 0)  # next-IFD pointer: caller patches
    )
    next_field_pos = count_size + len(entries) * entry_size
    return body + b"".join(overflow) + b"".join(payloads), next_field_pos
