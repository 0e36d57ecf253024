"""Tile codecs for the mini-raster format: pure numpy + stdlib.

Re-implements, from public TIFF semantics, the compression/predictor matrix
that the reference engine decodes (rasteret `src/rasteret/fetch/cog.py:843-966`
dispatches raw/deflate/LZW/PackBits/LZMA/ZSTD with predictor 2 horizontal
delta and predictor 3 float byte-shuffle).  The lossless set here is raw /
deflate(zlib) / lzma / bz2 / packbits / LZW (TIFF 6.0 semantics, pure
Python), plus zstd — RFC 8878 implemented from scratch in
``format/zstd.py`` (pure-Python reference decoder validated against the
reference's libtiff fixture and live libzstd streams; a ctypes libzstd
fast path is used when the system library is present) — and a deterministic
quantizing "qlossy" codec standing in for JPEG-style lossy formats
(exercises the PSNR>=40dB gate).

All functions operate on one tile: a 2-D numpy array in, bytes out (and back).
They run inside Arrow-batched pandas UDFs on executors — never per-row Python
at the DataFrame layer.
"""

from __future__ import annotations

import bz2
import lzma
import zlib

import numpy as np

# --- compression ids (stored in the header) ---------------------------------
COMP_RAW = 0
COMP_DEFLATE = 1
COMP_LZMA = 2
COMP_BZ2 = 3
COMP_PACKBITS = 4
COMP_QLOSSY = 5  # deterministic lossy: quantize -> zigzag varint-ish -> deflate
COMP_LZW = 6  # TIFF 6.0 LZW (pure-Python, spec semantics)
COMP_ZSTD = 7  # RFC 8878: format/zstd.py (pure-Python + optional libzstd fast path)
COMP_JPEG = 8  # baseline JPEG (T.81), pure numpy/stdlib: format/jpegcodec.py
COMP_LERC = 9  # Esri LERC2: format/lerc.py (pure-Python + optional libLerc validation)

COMP_NAMES = {
    "raw": COMP_RAW,
    "deflate": COMP_DEFLATE,
    "lzma": COMP_LZMA,
    "bz2": COMP_BZ2,
    "packbits": COMP_PACKBITS,
    "qlossy": COMP_QLOSSY,
    "lzw": COMP_LZW,
    "zstd": COMP_ZSTD,
    "jpeg": COMP_JPEG,
    "lerc": COMP_LERC,
}
COMP_CODES = {v: k for k, v in COMP_NAMES.items()}
LOSSY_COMPS = {COMP_QLOSSY, COMP_JPEG}  # unconditionally lossy codecs


def is_lossy(compression: int, qstep: float = 1.0) -> bool:
    """True when a tile encoded with (compression, qstep) loses precision:
    qlossy/JPEG always; LERC exactly when qstep != 1.0 (qstep maps to
    MAX_Z_ERROR = qstep/2)."""
    return compression in LOSSY_COMPS or (compression == COMP_LERC and qstep != 1.0)


def _jpeg_quality(qstep: float) -> int:
    """For COMP_JPEG the header's qstep field carries the JFIF quality
    (2..100); the format default qstep=1.0 maps to quality 90."""
    q = int(round(qstep))
    return q if 2 <= q <= 100 else 90


PRED_NONE = 1
PRED_HORIZONTAL = 2  # TIFF predictor 2: per-row sample differencing
PRED_FLOAT = 3  # TIFF predictor 3: byte-shuffle + per-row byte differencing

# --- dtype codes -------------------------------------------------------------
# append-only: codes are persisted in written headers, order must not change.
# int8/float16 exist for the TIFF container (SampleFormat x BitsPerSample
# combinations real GeoTIFFs use, e.g. the reference's fp16/i8 fixtures).
DTYPES = ["uint8", "uint16", "uint32", "int16", "int32", "float32", "float64",
          "int8", "float16"]
DTYPE_CODE = {name: i for i, name in enumerate(DTYPES)}
CODE_DTYPE = {i: np.dtype(name) for i, name in enumerate(DTYPES)}


# --- packbits ----------------------------------------------------------------
def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773 semantics)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    if n == 0:
        return b""
    # run boundaries
    change = np.nonzero(arr[1:] != arr[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    out = bytearray()
    lit_start = None  # start of pending literal run
    for s, e in zip(starts, ends):
        run = e - s
        if run >= 3:
            if lit_start is not None:
                _emit_literals(out, arr, lit_start, s)
                lit_start = None
            while run > 0:
                chunk = min(run, 128)
                out.append((257 - chunk) & 0xFF)  # -(chunk-1) as unsigned
                out.append(int(arr[s]))
                s += chunk
                run -= chunk
        else:
            if lit_start is None:
                lit_start = s
    if lit_start is not None:
        _emit_literals(out, arr, lit_start, n)
    return bytes(out)


def _emit_literals(out: bytearray, arr: np.ndarray, s: int, e: int) -> None:
    while s < e:
        chunk = min(e - s, 128)
        out.append(chunk - 1)
        out.extend(arr[s : s + chunk].tobytes())
        s += chunk


def packbits_decode(data: bytes, expected: int) -> bytes:
    src = np.frombuffer(data, dtype=np.uint8)
    out = bytearray()
    i = 0
    n = src.size
    while i < n and len(out) < expected:
        h = int(src[i])
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out.extend(src[i : i + h + 1].tobytes())
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out.extend(bytes([int(src[i])]) * (257 - h))
            i += 1
        # h == 128: no-op
    return bytes(out[:expected])


# --- TIFF 6.0 LZW -------------------------------------------------------------
# Public-spec semantics (TIFF 6.0 §13 as real-world writers implement it,
# VERIFIED against libtiff-produced fixtures under /root/reference/fixtures):
# MSB-first variable-width codes starting at 9 bits, ClearCode=256, EOI=257,
# first table entry 258.  Width accounting: the ENCODER widens when the next
# code to assign no longer fits (next_code == 1<<width); the DECODER — whose
# table lags one entry behind — widens at len(table) == (1<<width) - 1 (this
# offset IS the spec's "early change").  The table resets via a ClearCode
# before reaching 4094 entries.  Pure Python per-symbol loops — a declared
# slow path kept for format-matrix completeness (the reference decodes LZW
# COGs through imagecodecs, `src/rasteret/fetch/cog.py:843-966`).
_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258
_LZW_MAX = 4094  # reset threshold


def _pack_codes(codes: list[int], widths: list[int]) -> bytes:
    """Pack variable-width (<=12 bit) codes MSB-first into bytes, final
    partial byte zero-padded — vectorized mirror of the per-code shift
    loop (each code spans at most 3 bytes; colliding byte ORs accumulate
    through the unbuffered ``np.bitwise_or.at``)."""
    c = np.asarray(codes, dtype=np.uint32)
    w = np.asarray(widths, dtype=np.int64)
    ends = np.cumsum(w)
    offs = ends - w
    total_bits = int(ends[-1]) if len(ends) else 0
    out = np.zeros((total_bits + 7) // 8 + 2, dtype=np.uint8)
    val24 = (c.astype(np.uint32) << (24 - w - (offs & 7)).astype(np.uint32))
    b0 = (offs >> 3).astype(np.int64)
    np.bitwise_or.at(out, b0, (val24 >> 16).astype(np.uint8))
    np.bitwise_or.at(out, b0 + 1, ((val24 >> 8) & 0xFF).astype(np.uint8))
    np.bitwise_or.at(out, b0 + 2, (val24 & 0xFF).astype(np.uint8))
    return out[: (total_bits + 7) // 8].tobytes()


def lzw_encode(data: bytes) -> bytes:
    # Strings in the table are represented as (prefix_code, next_byte) pairs
    # — the textbook trie keying — so the hot loop allocates no bytes
    # objects.  The emitted code sequence is identical to the byte-string
    # table formulation (greedy longest-match over the same dictionary).
    # Codes collect as (code, width) pairs and pack into the bit stream in
    # ONE vectorized pass at the end (the per-code shift-and-append emitter
    # was the profile's top cost in the overview-building re-encode path).
    codes: list[int] = []
    wids: list[int] = []
    emit = codes.append
    emit_w = wids.append

    table: dict[int, int] = {}
    next_code, width = _LZW_FIRST, 9
    emit(_LZW_CLEAR); emit_w(width)
    w = -1  # current match: a code (single bytes are their own codes)
    for byte in data:
        if w < 0:
            w = byte
            continue
        key = (w << 8) | byte
        nxt = table.get(key)
        if nxt is not None:
            w = nxt
            continue
        emit(w); emit_w(width)
        table[key] = next_code
        next_code += 1
        # libtiff-compatible width accounting (verified against real-world
        # LZW fixtures): the encoder widens once the next code to assign no
        # longer fits the current width; the decoder — whose table lags one
        # entry behind — widens at (1<<width)-1 (its "early change")
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= _LZW_MAX:
            emit(_LZW_CLEAR); emit_w(width)
            table = {}
            next_code, width = _LZW_FIRST, 9
        w = byte
    if w >= 0:
        emit(w); emit_w(width)
        # the decoder appends a (speculative) table entry for this final
        # code even though the encoder assigns none — mid-stream its table
        # sits one behind (len == next_code - 1), after the final code it
        # catches up (len == next_code).  If that catch-up lands exactly on
        # the early-change boundary the decoder reads EOI one bit wider, so
        # the encoder must widen with it — otherwise the tail desyncs and
        # the stream over-decodes (data-dependent: caught by an overview
        # strip whose final data code sat at next_code == 2^11 - 1).
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_LZW_EOI); emit_w(width)
    return _pack_codes(codes, wids)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 LZW decode, same semantics as the per-symbol reference loop
    (``_lzw_decode_ref`` below, kept as the parity oracle) but restructured
    for speed:

    * codes are extracted from the bit stream VECTORIZED per constant-width
      segment — between CLEAR codes the decoder's width schedule is
      deterministic in the code count (widen at table length (1<<w)-1, one
      new entry per code after the first), so whole runs of 9/10/11/12-bit
      codes pull out of numpy in one gather instead of a per-code shift loop;
    * every table entry is, by construction, a contiguous slice of the
      OUTPUT produced so far (the entry completed while processing code_k is
      the previous emission plus the first byte of the current one, which
      are adjacent in the output) — so the table is two int lists
      (start, length) and each emission is one C-speed bytearray slice copy
      instead of bytes concatenation.
    """
    n_bits = len(data) * 8
    if n_bits == 0:
        return b""
    src = np.frombuffer(data, dtype=np.uint8)
    # pad so the 3-byte gather below never reads past the end
    padded = np.concatenate([src, np.zeros(2, dtype=np.uint8)]).astype(np.uint32)

    def extract(bitpos: int, width: int, count: int) -> np.ndarray:
        starts = bitpos + width * np.arange(count, dtype=np.int64)
        b0 = starts >> 3
        v = (padded[b0] << 16) | (padded[b0 + 1] << 8) | padded[b0 + 2]
        shift = 24 - (starts & 7) - width
        return (v >> shift) & ((1 << width) - 1)

    # output holds slack for one max-length entry past `expected` (entries
    # grow by one byte per code; table depth bounds their length)
    out = bytearray(expected + _LZW_MAX + 2)
    out_mv = memoryview(out)
    pos = 0
    bitpos = 0
    width = 9
    # table for codes >= _LZW_FIRST as output slices
    ent_start: list[int] = []
    ent_len: list[int] = []
    prev_start = -1
    prev_len = 0
    done = False

    while not done and pos < expected and bitpos + width <= n_bits:
        # codes remaining before the deterministic width bump (the table
        # grows by one entry per code except the first after a reset)
        tlen = _LZW_FIRST + len(ent_start)
        if width < 12:
            seg_n = ((1 << width) - 1) - tlen + (1 if prev_start < 0 else 0)
        else:
            seg_n = (n_bits - bitpos) // width
        seg_n = min(seg_n, (n_bits - bitpos) // width)
        if seg_n <= 0:
            # exactly at a width boundary (or out of bits)
            if (n_bits - bitpos) // width <= 0:
                break
            seg_n = 1
        codes = extract(bitpos, width, seg_n)
        # truncate at the first control code; handle it after the data run
        # (only CLEAR/EOI are control codes; larger values are table refs)
        special = -1
        ctl = np.nonzero((codes == _LZW_CLEAR) | (codes == _LZW_EOI))[0]
        if len(ctl):
            special = int(codes[ctl[0]])
            codes = codes[: ctl[0]]
        for code in codes.tolist():
            tlen = _LZW_FIRST + len(ent_start)
            if code < 256:
                # literal: emission is one byte
                if prev_start >= 0:
                    ent_start.append(prev_start)
                    ent_len.append(prev_len + 1)
                out[pos] = code
                prev_start = pos
                prev_len = 1
                pos += 1
            elif code > tlen or code == _LZW_EOI or code == _LZW_CLEAR:
                raise ValueError(f"corrupt LZW stream: code {code} out of range")
            elif code < tlen:
                i = code - _LZW_FIRST
                s = ent_start[i]
                ln = ent_len[i]
                if prev_start >= 0:
                    ent_start.append(prev_start)
                    ent_len.append(prev_len + 1)
                out_mv[pos : pos + ln] = out_mv[s : s + ln]
                prev_start = pos
                prev_len = ln
                pos += ln
            else:  # code == tlen: KwKwK
                if prev_start < 0:
                    raise ValueError(
                        f"corrupt LZW stream: code {code} out of range"
                    )
                ln = prev_len + 1
                out_mv[pos : pos + prev_len] = out_mv[prev_start : prev_start + prev_len]
                out[pos + prev_len] = out[prev_start]
                ent_start.append(prev_start)
                ent_len.append(ln)
                prev_start = pos
                prev_len = ln
                pos += ln
            if pos >= expected:
                done = True
                break
        else:
            bitpos += width * len(codes)
            if special == _LZW_EOI:
                done = True
            elif special == _LZW_CLEAR:
                bitpos += width
                width = 9
                ent_start = []
                ent_len = []
                prev_start = -1
                prev_len = 0
            elif width < 12 and _LZW_FIRST + len(ent_start) == (1 << width) - 1:
                # the decoder's table lags the encoder's by one entry (it
                # only completes entry e_{k-1} while processing code_k), so
                # it widens one entry earlier than the encoder's (1<<width)
                # rule — the boundary real-world writers (libtiff et al.)
                # expect, verified against the reference's LZW fixtures
                width += 1
            continue
        break  # inner loop hit `expected` mid-run
    # a stream that ran out of bits returns only what it decoded (same
    # short-buffer contract as the per-symbol loop)
    return bytes(out_mv[: min(pos, expected)])


def _lzw_decode_ref(data: bytes, expected: int) -> bytes:
    """Per-symbol reference decoder (the original formulation) — kept as the
    parity oracle for the vectorized ``lzw_decode`` above."""
    out = bytearray()
    table: list[bytes] = []
    bitbuf = 0
    bitcnt = 0
    pos = 0
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(data)
    while len(out) < expected:
        while bitcnt < width:
            if pos >= n:
                return bytes(out[:expected])
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        bitcnt -= width
        code = (bitbuf >> bitcnt) & ((1 << width) - 1)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            reset()
            continue
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:expected])


# --- predictors --------------------------------------------------------------
def apply_predictor(tile: np.ndarray, predictor: int) -> bytes:
    """tile (h, w) -> predictor-transformed bytes (row-major)."""
    if predictor == PRED_NONE:
        return np.ascontiguousarray(tile).tobytes()
    if predictor == PRED_HORIZONTAL:
        if tile.dtype.kind == "f":
            # integer differencing operates on the raw bit patterns for
            # float samples (real-world TIFF writer behavior, verified
            # against the fp16 pred2/pred3 fixture pair which holds the
            # same array under both predictors)
            iv = np.ascontiguousarray(tile).view(f"u{tile.dtype.itemsize}")
            d = iv.copy()
            d[:, 1:] = iv[:, 1:] - iv[:, :-1]
            return np.ascontiguousarray(d).tobytes()
        d = tile.copy()
        d[:, 1:] = tile[:, 1:] - tile[:, :-1]  # wraps naturally for ints
        return np.ascontiguousarray(d).tobytes()
    if predictor == PRED_FLOAT:
        h, w = tile.shape
        itemsize = tile.dtype.itemsize
        # big-endian bytes, then split byte planes per row (shuffle), then delta
        be = tile.astype(tile.dtype.newbyteorder(">"))
        raw = np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(h, w, itemsize)
        shuffled = raw.transpose(0, 2, 1).reshape(h, w * itemsize)
        d = shuffled.copy()
        d[:, 1:] = shuffled[:, 1:] - shuffled[:, :-1]
        return np.ascontiguousarray(d).tobytes()
    raise ValueError(f"unknown predictor {predictor}")


def undo_predictor(buf: bytes, predictor: int, dtype: np.dtype, h: int, w: int) -> np.ndarray:
    if predictor == PRED_NONE:
        return np.frombuffer(buf, dtype=dtype).reshape(h, w).copy()
    if predictor == PRED_HORIZONTAL:
        if dtype.kind == "f":  # undo bit-pattern differencing (see encoder)
            ui = np.dtype(f"u{dtype.itemsize}").newbyteorder(dtype.byteorder)
            d = np.frombuffer(buf, dtype=ui).reshape(h, w).copy()
            np.cumsum(d, axis=1, dtype=d.dtype, out=d)
            return d.view(dtype)
        d = np.frombuffer(buf, dtype=dtype).reshape(h, w).copy()
        np.cumsum(d, axis=1, dtype=d.dtype, out=d)
        return d
    if predictor == PRED_FLOAT:
        itemsize = np.dtype(dtype).itemsize
        d = np.frombuffer(buf, dtype=np.uint8).reshape(h, w * itemsize).copy()
        np.cumsum(d, axis=1, dtype=np.uint8, out=d)
        planes = d.reshape(h, itemsize, w).transpose(0, 2, 1)  # (h, w, itemsize)
        be = np.ascontiguousarray(planes).tobytes()
        return (
            np.frombuffer(be, dtype=np.dtype(dtype).newbyteorder(">"))
            .reshape(h, w)
            .astype(dtype)
        )
    raise ValueError(f"unknown predictor {predictor}")


# --- top-level tile encode/decode --------------------------------------------
def encode_tile(
    tile: np.ndarray, compression: int, predictor: int = PRED_NONE, qstep: float = 1.0
) -> bytes:
    """Encode one (tile_h, tile_w) array into its stored byte payload."""
    if compression == COMP_QLOSSY:
        q = np.round(tile.astype(np.float64) / qstep).astype(np.int32)
        return zlib.compress(q.tobytes(), 6)
    if compression == COMP_JPEG:
        from rasteret_spark.format import jpegcodec

        if tile.dtype != np.uint8:
            raise ValueError(
                f"JPEG tiles are 8-bit only; got {tile.dtype} (use qlossy or "
                "a lossless codec for wider samples)"
            )
        return jpegcodec.encode(tile, quality=_jpeg_quality(qstep))
    if compression == COMP_LERC:
        from rasteret_spark.format import lerc as _lerc

        if predictor != PRED_NONE:
            raise ValueError("LERC tiles carry no TIFF predictor")
        # qstep is the quantization step, i.e. 2*maxZError (GDAL's
        # MAX_Z_ERROR); the default 1.0 means lossless
        return _lerc.encode(tile, max_z_error=qstep / 2.0 if qstep != 1.0 else 0.0)
    raw = apply_predictor(tile, predictor)
    if compression == COMP_RAW:
        return raw
    if compression == COMP_DEFLATE:
        return zlib.compress(raw, 6)
    if compression == COMP_LZMA:
        return lzma.compress(raw, preset=1)
    if compression == COMP_BZ2:
        return bz2.compress(raw, 5)
    if compression == COMP_PACKBITS:
        return packbits_encode(raw)
    if compression == COMP_LZW:
        return lzw_encode(raw)
    if compression == COMP_ZSTD:
        from rasteret_spark.format import zstd as _zstdmod

        return _zstdmod.compress_fast(raw, level=3)
    raise ValueError(f"unknown compression {compression}")


def decode_tile(
    payload: bytes,
    compression: int,
    predictor: int,
    dtype: np.dtype,
    tile_h: int,
    tile_w: int,
    qstep: float = 1.0,
    jpeg_tables: bytes | None = None,
) -> np.ndarray:
    """Decode one stored tile payload back to a (tile_h, tile_w) array."""
    dtype = np.dtype(dtype)
    expected = tile_h * tile_w * dtype.itemsize
    if compression == COMP_JPEG:
        from rasteret_spark.format import jpegcodec

        out = jpegcodec.decode(payload, tables=jpeg_tables)
        if out.ndim != 2:
            raise ValueError(
                f"planar tile decode expects grayscale JPEG, got shape "
                f"{out.shape} (interleaved RGB JPEG goes through "
                "tiff.decode_chunky_tile/decode_full)"
            )
        # JPEG streams carry their own dimensions; TIFF edge tiles may hold
        # the full padded tile — crop like the short-strip path below
        if out.shape[0] > tile_h or out.shape[1] > tile_w:
            out = out[:tile_h, :tile_w]
        return out.astype(dtype) if np.dtype(dtype) != out.dtype else out
    if compression == COMP_LERC:
        from rasteret_spark.format import lerc as _lerc

        raw = _lerc.unwrap_additional_compression(payload, expected)
        bands, valid = _lerc.decode_fast(raw)
        if bands.ndim == 4:  # nDepth>1 (GDAL chunky) has no planar meaning
            raise ValueError(
                "multi-depth LERC tile in a planar read path; route chunky "
                "LERC rasters through tiff.decode_chunky_tile"
            )
        if bands.shape[0] != 1:
            raise ValueError(f"expected 1-band LERC tile, got {bands.shape[0]}")
        out = bands[0]
        out[~valid[0]] = 0  # masked pixels have no stored value
        # edge tiles may be stored full-size (TIFF pads) or exact-size
        if out.shape[0] > tile_h or out.shape[1] > tile_w:
            out = out[:tile_h, :tile_w]
        return out.astype(dtype) if out.dtype != np.dtype(dtype) else out
    if compression == COMP_QLOSSY:
        q = np.frombuffer(zlib.decompress(payload), dtype=np.int32).reshape(tile_h, tile_w)
        vals = q.astype(np.float64) * qstep
        if dtype.kind in "ui":
            info = np.iinfo(dtype)
            vals = np.clip(np.round(vals), info.min, info.max)
        return vals.astype(dtype)
    if compression == COMP_RAW:
        raw = payload
    elif compression == COMP_DEFLATE:
        raw = zlib.decompress(payload)
    elif compression == COMP_LZMA:
        raw = lzma.decompress(payload)
    elif compression == COMP_BZ2:
        raw = bz2.decompress(payload)
    elif compression == COMP_PACKBITS:
        raw = packbits_decode(payload, expected)
    elif compression == COMP_LZW:
        raw = lzw_decode(payload, expected)
    elif compression == COMP_ZSTD:
        from rasteret_spark.format import zstd as _zstdmod

        raw = _zstdmod.decompress_fast(payload, expected=expected)
    else:
        raise ValueError(f"unknown compression {compression}")
    if len(raw) != expected:
        # TIFF strip layouts store the FINAL strip short (only the remaining
        # rows, unpadded — unlike tiles).  Accept a row-aligned short buffer
        # and return the actual rows; window pasting only reads the valid
        # region anyway.  Anything not row-aligned is corruption: raise.
        row_bytes = tile_w * dtype.itemsize
        if len(raw) % row_bytes == 0 and 0 < len(raw) < expected:
            tile_h = len(raw) // row_bytes
        else:
            raise ValueError(
                f"tile payload decodes to {len(raw)} bytes; expected "
                f"{expected} ({tile_h}x{tile_w} {dtype})"
            )
    return undo_predictor(raw, predictor, dtype, tile_h, tile_w)


def psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    a64 = a.astype(np.float64)
    b64 = b.astype(np.float64)
    mse = float(np.mean((a64 - b64) ** 2))
    if mse == 0.0:
        return float("inf")
    if peak is None:
        peak = float(np.max(np.abs(a64))) or 1.0
    return 10.0 * np.log10(peak * peak / mse)
