"""From-scratch Esri LERC2 codec — wire-format validation.

Same discipline as test_zstd.py: roundtripping our own encoder/decoder
pair proves nothing about the format, so every decoder test runs against
blobs produced by an INDEPENDENT encoder (the system libLerc 4 via
ctypes, present in this container) and every encoder test decodes our
blobs through libLerc.  The pure pair roundtrip is still asserted — it
guards determinism and the no-lib fallback — but never alone.

Reference parity: rasteret declares LERC in its COG codec matrix
(src/rasteret/fetch/cog.py:843-966, TIFF compression id 34887); here the
LERC2 format itself (versions 2-6) is implemented from the public spec in
format/lerc.py, empirically pinned against libLerc output.
"""

import ctypes
import struct
import zlib

import numpy as np
import pytest

from rasteret_spark.format import codecs, lerc, tiff, tiffwrite

_HAVE_LIB = lerc._liblerc() is not None

needs_lib = pytest.mark.skipif(
    not _HAVE_LIB, reason="system libLerc absent; cross-validation impossible"
)

_DT_IDS = {
    np.dtype(np.int8): 0, np.dtype(np.uint8): 1, np.dtype(np.int16): 2,
    np.dtype(np.uint16): 3, np.dtype(np.int32): 4, np.dtype(np.uint32): 5,
    np.dtype(np.float32): 6, np.dtype(np.float64): 7,
}


def _lib():
    lib = lerc._liblerc()
    assert lib is not None
    if not hasattr(lib, "_efv_set"):
        lib.lerc_encodeForVersion.restype = ctypes.c_uint
        lib.lerc_encodeForVersion.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_double, ctypes.c_char_p, ctypes.c_uint,
            ctypes.POINTER(ctypes.c_uint),
        ]
        lib._efv_set = True
    return lib


def _lib_encode(arr, maxz=0.0, valid=None, version=None):
    lib = _lib()
    a = arr if arr.ndim == 3 else arr[None]
    nb, h, w = a.shape
    nm, mk = (1, np.ascontiguousarray(valid, np.uint8).tobytes()) if valid is not None else (0, None)
    buf = ctypes.create_string_buffer(4 * a.nbytes + 16384)
    n = ctypes.c_uint(0)
    a = np.ascontiguousarray(a)
    dt = _DT_IDS[a.dtype]
    if version is None:
        st = lib.lerc_encode(
            a.ctypes.data_as(ctypes.c_void_p), dt, 1, w, h, nb, nm, mk,
            maxz, buf, len(buf), ctypes.byref(n))
    else:
        st = lib.lerc_encodeForVersion(
            a.ctypes.data_as(ctypes.c_void_p), version, dt, 1, w, h, nb, nm,
            mk, maxz, buf, len(buf), ctypes.byref(n))
    assert st == 0, f"libLerc encode failed: {st}"
    return buf.raw[: n.value]


def _lib_decode(blob, dtype, nb, h, w):
    lib = _lib()
    out = np.empty((nb, h, w), dtype=dtype)
    mask = np.empty((h, w), dtype=np.uint8)
    st = lib.lerc_decode(
        blob, len(blob), 1, mask.ctypes.data_as(ctypes.c_char_p), 1, w, h,
        nb, _DT_IDS[np.dtype(dtype)], out.ctypes.data_as(ctypes.c_void_p))
    assert st == 0, f"libLerc decode failed: {st}"
    return out, mask.astype(bool)


def _zeroed(arr, valid):
    out = arr.copy()
    out[..., ~valid] = 0
    return out


# --- decoder vs libLerc across the format surface -----------------------------
_DTYPES = [np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32,
           np.float32, np.float64]


def _cases_for(dt, rng):
    dt = np.dtype(dt)
    for h, w in ((1, 1), (7, 9), (8, 8), (16, 16), (17, 23), (33, 41)):
        if dt.kind == "f":
            yield np.full((h, w), 42.5, dt)                       # constant
            yield (np.arange(h * w, dtype=np.float64)
                   .reshape(h, w) * 0.37 - 50).astype(dt)         # ramp crossing 0
            yield rng.uniform(-1000, 1000, (h, w)).astype(dt)     # noise
            yield rng.randint(-500, 500, (h, w)).astype(dt)       # integral floats
            yield rng.choice(np.array([0.0, 250.0, -1000.0, 3.25], dt), (h, w))  # LUT
        else:
            info = np.iinfo(dt)
            lo, hi = max(info.min, -30000), min(info.max, 30000)
            yield np.full((h, w), min(100, info.max), dt)
            yield (np.arange(h * w).reshape(h, w) % max(2, min(200, hi))).astype(dt)
            yield rng.randint(lo, hi + 1, (h, w)).astype(dt)      # noise / raw tiles
            yield rng.randint(0, 2, (h, w)).astype(dt)            # 1-bit stuffing
            yield (rng.randint(0, 10, (h, w)) + lo).astype(dt)    # shortened offsets
            if dt == np.uint8:
                yield rng.choice(np.array([3, 7, 7, 7, 7, 7, 9], np.uint8), (h, w))  # Huffman
                yield (np.tile(np.arange(w) % 32, h).reshape(h, w) + 100).astype(np.uint8)  # delta-Huffman


@needs_lib
@pytest.mark.parametrize("dt", _DTYPES, ids=lambda d: np.dtype(d).name)
def test_decode_matches_liblerc(dt):
    rng = np.random.RandomState(12345)
    for arr in _cases_for(dt, rng):
        h, w = arr.shape
        for mask in (None, rng.rand(h, w) > 0.3):
            if mask is not None and not mask.any():
                mask[0, 0] = True
            blob = _lib_encode(arr, valid=mask)
            ref, refmask = _lib_decode(blob, arr.dtype, 1, h, w)
            got, gotvalid = lerc.decode(blob)
            assert np.array_equal(gotvalid[0], refmask)
            assert np.array_equal(got, _zeroed(ref, refmask))


@needs_lib
@pytest.mark.parametrize("ver", [2, 3, 4, 5, 6])
def test_decode_older_versions(ver):
    rng = np.random.RandomState(ver)
    for dt in (np.uint8, np.int16, np.float32):
        arr = rng.randint(0, 30, (16, 16)).astype(dt)
        mask = rng.rand(16, 16) > 0.4
        for m in (None, mask):
            blob = _lib_encode(arr, version=ver, valid=m)
            assert struct.unpack_from("<i", blob, 6)[0] == ver
            ref, refmask = _lib_decode(blob, arr.dtype, 1, 16, 16)
            got, gotvalid = lerc.decode(blob)
            assert np.array_equal(gotvalid[0], refmask)
            assert np.array_equal(got, _zeroed(ref, refmask))


@needs_lib
def test_fully_invalid_micro_blocks_both_directions():
    """liblerc writes a comprFlag byte (low2 == 2 + test code) even for
    blocks with no valid pixel; skipping it desyncs the tile stream into
    silent corruption.  Routine in real COGs at scene borders."""
    a = np.arange(8 * 24, dtype=np.uint16).reshape(8, 24)
    m = np.ones((8, 24), bool)
    m[:, 8:16] = False  # middle 8x8 block fully invalid
    # decode liblerc's blob
    blob = _lib_encode(a, valid=m)
    got, gotvalid = lerc.decode(blob)
    assert np.array_equal(gotvalid[0], m)
    assert np.array_equal(got[0], np.where(m, a, 0))
    # liblerc decodes OUR blob
    mine = lerc.encode(a, m)
    ref, refmask = _lib_decode(mine, np.uint16, 1, 8, 24)
    assert np.array_equal(refmask, m)
    assert np.array_equal(np.where(m, ref[0], 0), np.where(m, a, 0))
    # deeper: random sparse masks with whole blocks knocked out
    rng = np.random.RandomState(11)
    for _ in range(8):
        h, w = rng.randint(8, 40), rng.randint(8, 40)
        arr = rng.randint(0, 500, (h, w)).astype(np.int16)
        mask = rng.rand(h, w) > 0.2
        for br in range(0, h, 8):
            for bc in range(0, w, 8):
                if rng.rand() < 0.4:
                    mask[br:br + 8, bc:bc + 8] = False
        if not mask.any():
            mask[0, 0] = True
        blob = _lib_encode(arr, valid=mask)
        got, gv = lerc.decode(blob)
        assert np.array_equal(gv[0], mask)
        assert np.array_equal(got[0], np.where(mask, arr, 0))
        mine = lerc.encode(arr, mask)
        ref, rm = _lib_decode(mine, np.int16, 1, h, w)
        assert np.array_equal(rm, mask)
        assert np.array_equal(np.where(mask, ref[0], 0), np.where(mask, arr, 0))


@needs_lib
def test_decode_lossy_quantization():
    rng = np.random.RandomState(9)
    arr = rng.uniform(-100, 100, (16, 16)).astype(np.float32)
    for maxz in (0.5, 0.01):
        blob = _lib_encode(arr, maxz=maxz)
        ref, _ = _lib_decode(blob, np.float32, 1, 16, 16)
        got, _ = lerc.decode(blob)
        # bit-exact vs libLerc's own reconstruction, not vs the input
        assert np.array_equal(got[0], ref[0])
        assert float(np.abs(got[0] - arr).max()) <= maxz + 1e-6


@needs_lib
def test_decode_multiband_concatenated():
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 200, (3, 12, 12)).astype(np.uint8)
    blob = _lib_encode(arr)
    ref, refmask = _lib_decode(blob, np.uint8, 3, 12, 12)
    got, _ = lerc.decode(blob)
    assert got.shape == (3, 12, 12)
    assert np.array_equal(got, ref)


@needs_lib
def test_decode_lossless_float_planes():
    # big enough that liblerc leaves one-sweep for the byte-plane sections,
    # with values crossing zero (exercises the sign/exponent upper-field
    # chain) and a mask
    a = ((np.arange(33 * 100, dtype=np.float64).reshape(33, 100)) * 0.37 - 50).astype(np.float32)
    rng = np.random.RandomState(1)
    m = rng.rand(33, 100) > 0.25
    for mask in (None, m):
        blob = _lib_encode(a, valid=mask)
        ref, refmask = _lib_decode(blob, np.float32, 1, 33, 100)
        got, gotvalid = lerc.decode(blob)
        assert np.array_equal(gotvalid[0], refmask)
        assert np.array_equal(got, _zeroed(ref, refmask))


def test_checksum_verified():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = bytearray(lerc.encode(arr))
    got, _ = lerc.decode(bytes(blob))
    assert np.array_equal(got[0], arr)
    blob[-3] ^= 0xFF  # corrupt data, not the header (those raise their own)
    with pytest.raises(lerc.LercError, match="Fletcher32"):
        lerc.decode(bytes(blob))


def test_reject_garbage():
    with pytest.raises(lerc.LercError):
        lerc.decode(b"NotLerc" + b"\x00" * 64)


# --- encoder ------------------------------------------------------------------
def _enc_cases(rng):
    for dt in _DTYPES:
        dt = np.dtype(dt)
        for h, w in ((1, 1), (5, 7), (16, 16), (13, 29)):
            if dt.kind == "f":
                yield np.full((h, w), 7.25, dt)
                yield rng.uniform(-50, 50, (h, w)).astype(dt)
                yield rng.randint(0, 100, (h, w)).astype(dt)
            else:
                info = np.iinfo(dt)
                lo, hi = max(info.min, -1000), min(info.max, 1000)
                yield np.full((h, w), 3, dt)
                yield rng.randint(lo, hi + 1, (h, w)).astype(dt)
                yield (np.arange(h * w).reshape(h, w) % 50).astype(dt)


def test_encode_pure_roundtrip_and_determinism():
    rng = np.random.RandomState(77)
    for arr in _enc_cases(rng):
        h, w = arr.shape
        for mask in (None, rng.rand(h, w) > 0.3):
            if mask is not None and not mask.any():
                mask[0, 0] = True
            blob = lerc.encode(arr, mask)
            assert blob == lerc.encode(arr.copy(), None if mask is None else mask.copy())
            got, gotvalid = lerc.decode(blob)
            want = arr if mask is None else np.where(mask, arr, 0)
            assert np.array_equal(got[0], want)
            if mask is not None:
                assert np.array_equal(gotvalid[0], mask)


@needs_lib
def test_encode_decodes_through_liblerc():
    rng = np.random.RandomState(78)
    for arr in _enc_cases(rng):
        h, w = arr.shape
        for mask in (None, rng.rand(h, w) > 0.3):
            if mask is not None and not mask.any():
                mask[0, 0] = True
            blob = lerc.encode(arr, mask)
            ref, refmask = _lib_decode(blob, arr.dtype, 1, h, w)
            want_mask = mask if mask is not None else np.ones((h, w), bool)
            assert np.array_equal(refmask, want_mask)
            assert np.array_equal(
                np.where(want_mask, ref[0], 0), np.where(want_mask, arr, 0))


@needs_lib
def test_encode_multiband_through_liblerc():
    rng = np.random.RandomState(79)
    arr = rng.randint(0, 999, (3, 9, 11)).astype(np.uint16)
    blob = lerc.encode(arr)
    ref, _ = _lib_decode(blob, np.uint16, 3, 9, 11)
    assert np.array_equal(ref, arr)
    got, _ = lerc.decode(blob)
    assert np.array_equal(got, arr)


def test_encode_lossy_within_tolerance():
    rng = np.random.RandomState(5)
    for dt, maxz in ((np.float32, 0.5), (np.float32, 0.01), (np.float64, 0.25),
                     (np.int16, 3.0), (np.uint8, 2.0), (np.int32, 10.0)):
        dt = np.dtype(dt)
        arr = rng.uniform(-100, 100, (23, 31)).astype(dt)
        for mask in (None, rng.rand(23, 31) > 0.3):
            blob = lerc.encode(arr, mask, max_z_error=maxz)
            assert blob == lerc.encode(arr.copy(), mask, max_z_error=maxz)
            got, _ = lerc.decode(blob)
            vm = mask if mask is not None else np.ones((23, 31), bool)
            err = np.abs(got[0].astype(np.float64) - arr.astype(np.float64))[vm]
            assert float(err.max()) <= maxz + 1e-9
            # lossy blobs are smaller than lossless ones
            assert len(blob) < len(lerc.encode(arr, mask)) or dt.kind in "iu"


@needs_lib
def test_encode_lossy_through_liblerc():
    rng = np.random.RandomState(6)
    arr = rng.uniform(-100, 100, (23, 31)).astype(np.float32)
    blob = lerc.encode(arr, max_z_error=0.1)
    ref, _ = _lib_decode(blob, np.float32, 1, 23, 31)
    got, _ = lerc.decode(blob)
    assert np.array_equal(ref[0], got[0])  # identical reconstructions
    assert float(np.abs(ref[0] - arr).max()) <= 0.1 + 1e-9


def test_encode_tile_qstep_maps_to_max_z_error():
    rng = np.random.RandomState(7)
    tile = rng.uniform(0, 50, (16, 16)).astype(np.float32)
    lossy = codecs.encode_tile(tile, codecs.COMP_LERC, qstep=0.2)  # maxz 0.1
    out = codecs.decode_tile(lossy, codecs.COMP_LERC, 1, np.dtype(np.float32), 16, 16)
    assert float(np.abs(out - tile).max()) <= 0.1 + 1e-9
    exact = codecs.encode_tile(tile, codecs.COMP_LERC)  # qstep 1.0 = lossless
    out2 = codecs.decode_tile(exact, codecs.COMP_LERC, 1, np.dtype(np.float32), 16, 16)
    assert np.array_equal(out2, tile)


# --- TIFF container integration ------------------------------------------------
def test_lerc_tiff_roundtrip_all_dtypes():
    rng = np.random.RandomState(42)
    for dtname in ("uint8", "int16", "uint16", "int32", "float32", "float64"):
        dt = np.dtype(dtname)
        if dt.kind == "f":
            arr = rng.uniform(-100, 100, (37, 53)).astype(dt)
        else:
            arr = rng.randint(0, 200, (37, 53)).astype(dt)
        blob = tiffwrite.write_tiff(
            arr, tile=(16, 16), compression="lerc",
            pixel_scale=(10, 10), tiepoint=(500000, 4000000), epsg=32633)
        m = tiff.parse_tiff_bytes(blob)
        assert m.compression == 34887
        em = tiff.to_engine_meta(m)
        assert em.compression == codecs.COMP_LERC
        tiles_x = (53 + 15) // 16
        out = np.zeros((37, 53), dt)
        for i, (off, cnt) in enumerate(zip(m.tile_offsets, m.tile_byte_counts)):
            t = codecs.decode_tile(blob[off:off + cnt], em.compression,
                                   em.predictor, dt, 16, 16)
            y0, x0 = (i // tiles_x) * 16, (i % tiles_x) * 16
            out[y0:y0 + 16, x0:x0 + 16] = t[: min(16, 37 - y0), : min(16, 53 - x0)]
        assert np.array_equal(out, arr)


def test_lerc_tiff_planar_multiband():
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 999, (3, 21, 33)).astype(np.uint16)
    blob = tiffwrite.write_tiff(arr, tile=(16, 16), compression="lerc")
    em = tiff.to_engine_meta(tiff.parse_tiff_bytes(blob))
    assert em.n_bands == 3 and em.compression == codecs.COMP_LERC


def test_lerc_additional_compression_wraps():
    """GDAL's LERC_DEFLATE / LERC_ZSTD wrap the whole blob; the decoder
    sniffs the framing."""
    rng = np.random.RandomState(6)
    tile = rng.randint(0, 100, (16, 16)).astype(np.uint8)
    raw = lerc.encode(tile)
    got = codecs.decode_tile(zlib.compress(raw), codecs.COMP_LERC, 1,
                             np.dtype(np.uint8), 16, 16)
    assert np.array_equal(got, tile)
    from rasteret_spark.format import zstd

    got2 = codecs.decode_tile(zstd.compress(raw), codecs.COMP_LERC, 1,
                              np.dtype(np.uint8), 16, 16)
    assert np.array_equal(got2, tile)


def test_lerc_write_guards():
    arr = np.zeros((8, 8), np.float16)
    with pytest.raises(ValueError, match="float16"):
        tiffwrite.write_tiff(arr, compression="lerc")
    with pytest.raises(ValueError, match="predictor"):
        tiffwrite.write_tiff(np.zeros((8, 8), np.float32),
                             compression="lerc", predictor=2)
    with pytest.raises(ValueError, match="chunky"):
        tiffwrite.write_tiff(np.zeros((8, 8, 3), np.uint8),
                             compression="lerc", interleaved=True)


def test_lzma_tiff_roundtrip():
    """TIFF compression 34925 (LZMA, the one id from the reference's codec
    dispatch that was still unmapped — `src/rasteret/fetch/cog.py:859`)."""
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 1000, (21, 37)).astype(np.uint16)
    blob = tiffwrite.write_tiff(arr, tile=(16, 16), compression="lzma", predictor=2)
    m = tiff.parse_tiff_bytes(blob)
    assert m.compression == 34925
    em = tiff.to_engine_meta(m)
    assert em.compression == codecs.COMP_LZMA
    tiles_x = (37 + 15) // 16
    out = np.zeros((21, 37), np.uint16)
    for i, (off, cnt) in enumerate(zip(m.tile_offsets, m.tile_byte_counts)):
        t = codecs.decode_tile(blob[off:off + cnt], em.compression,
                               em.predictor, np.dtype(np.uint16), 16, 16)
        y0, x0 = (i // tiles_x) * 16, (i % tiles_x) * 16
        out[y0:y0 + 16, x0:x0 + 16] = t[: min(16, 21 - y0), : min(16, 37 - x0)]
    assert np.array_equal(out, arr)


def test_lerc_parameters_tag_written():
    blob = tiffwrite.write_tiff(np.zeros((8, 8), np.uint8), compression="lerc")
    # tag 50674, LONG x2, values (4, 0)
    m = tiff.parse_tiff_bytes(blob)
    assert m.compression == 34887  # parser tolerates the extra tag