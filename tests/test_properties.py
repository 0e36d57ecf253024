"""Hypothesis property tests over the driver-side kernels (no Spark in the
loops — these run in milliseconds per example).  Deepens the §5 test-strategy
parity: the reference pins its geometry/window math with fixture matrices;
here the same kernels additionally hold under generated inputs.

Properties pinned:
  * codec matrix: encode/decode identity for arbitrary tiles, every lossless
    codec x predictor combination (incl. the pure-Python LZW);
  * PIP: the scanline grid kernel is BIT-IDENTICAL to the generic even-odd
    ray-cast for arbitrary simple polygons on arbitrary grids;
  * quadtree cells: pack/unpack identity, parent containment, cover_bbox
    covers every sampled interior point, compact/uncover equivalence;
  * CRS: forward/inverse identity for every builtin projection family;
  * byte-range coalescing: coverage + gap/size bounds.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from rasteret_spark import crs, geom, grid
from rasteret_spark.format import codecs, miniraster as mr

# keep the whole file under ~20 s: small example counts, no deadline flake
SETTINGS = dict(deadline=None, max_examples=40)


# --- codecs -------------------------------------------------------------------
@settings(**SETTINGS)
@given(
    data=st.binary(min_size=0, max_size=4096),
    comp=st.sampled_from(["deflate", "lzma", "bz2", "packbits", "lzw"]),
)
def test_bytes_roundtrip_all_codecs(data, comp):
    cid = codecs.COMP_NAMES[comp]
    if comp == "packbits":
        enc = codecs.packbits_encode(data)
        assert codecs.packbits_decode(enc, len(data)) == data
    elif comp == "lzw":
        enc = codecs.lzw_encode(data)
        assert codecs.lzw_decode(enc, len(data)) == data
    else:
        arr = np.frombuffer(data.ljust(64, b"\0"), dtype=np.uint8)[:64].reshape(8, 8)
        out = codecs.decode_tile(
            codecs.encode_tile(arr, cid), cid, codecs.PRED_NONE, np.dtype("uint8"), 8, 8
        )
        np.testing.assert_array_equal(out, arr)


@settings(**SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    comp=st.sampled_from(["deflate", "packbits", "lzw", "raw"]),
    pred=st.sampled_from([codecs.PRED_NONE, codecs.PRED_HORIZONTAL]),
    dtype=st.sampled_from(["uint8", "uint16", "int32"]),
)
def test_tile_roundtrip_codec_predictor_matrix(seed, comp, pred, dtype):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
    tile = rng.integers(0, 250, size=(h, w)).astype(dtype)
    cid = codecs.COMP_NAMES[comp]
    out = codecs.decode_tile(codecs.encode_tile(tile, cid, pred), cid, pred, tile.dtype, h, w)
    np.testing.assert_array_equal(out, tile)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1))
def test_float_predictor3_roundtrip(seed):
    rng = np.random.default_rng(seed)
    tile = rng.normal(0, 1e4, size=(17, 23)).astype("float32")
    cid = codecs.COMP_DEFLATE
    out = codecs.decode_tile(
        codecs.encode_tile(tile, cid, codecs.PRED_FLOAT), cid, codecs.PRED_FLOAT,
        tile.dtype, 17, 23,
    )
    np.testing.assert_array_equal(out, tile)


# --- PIP: scanline == generic ray-cast -----------------------------------------
@st.composite
def simple_polygon(draw):
    """Star-shaped simple polygon: sorted angles around a center."""
    n = draw(st.integers(3, 9))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.2, 1.0, n)
    cx, cy = rng.uniform(-1, 1, 2)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    ring = np.stack([np.append(xs, xs[0]), np.append(ys, ys[0])], axis=1)
    return geom.wkb_polygon([ring])


@settings(**SETTINGS)
@given(buf=simple_polygon(), seed=st.integers(0, 2**31 - 1))
def test_scanline_pip_bitidentical_to_raycast(buf, seed):
    rng = np.random.default_rng(seed)
    nx, ny = int(rng.integers(1, 30)), int(rng.integers(1, 30))
    xs = np.sort(rng.uniform(-2.2, 2.2, nx))
    ys = rng.uniform(-2.2, 2.2, ny)  # arbitrary order: grid rows need no sort
    grid_mask = geom.points_in_polygon_grid(xs, ys, buf)
    gx, gy = np.meshgrid(xs, ys)
    generic = geom.points_in_polygon_wkb(gx.ravel(), gy.ravel(), buf).reshape(ny, nx)
    np.testing.assert_array_equal(grid_mask, generic)


# --- quadtree cells ------------------------------------------------------------
@settings(**SETTINGS)
@given(
    res=st.integers(0, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_cell_pack_unpack_and_parent(res, seed):
    rng = np.random.default_rng(seed)
    n = 1 << res
    ix = int(rng.integers(0, n))
    iy = int(rng.integers(0, n))
    c = grid.cell_id(res, ix, iy)
    assert grid.cell_res(c) == res and grid.cell_ix(c) == ix and grid.cell_iy(c) == iy
    if res > 0:
        p = grid.parent(c)
        assert grid.cell_res(p) == res - 1
        assert grid.cell_ix(p) == ix // 2 and grid.cell_iy(p) == iy // 2
        # the child's bounds nest inside the parent's
        cx0, cy0, cx1, cy1 = grid.cell_bounds(c)
        px0, py0, px1, py1 = grid.cell_bounds(p)
        assert px0 <= cx0 and py0 <= cy0 and cx1 <= px1 and cy1 <= py1


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), res=st.integers(1, 10))
def test_cover_bbox_covers_interior_points(seed, res):
    rng = np.random.default_rng(seed)
    x0, y0 = rng.uniform(-170, 160), rng.uniform(-80, 70)
    x1, y1 = x0 + rng.uniform(0.01, 9.0), y0 + rng.uniform(0.01, 9.0)
    cells = set(grid.cover_bbox(x0, y0, x1, y1, res).tolist())
    for _ in range(20):
        px = rng.uniform(x0, x1)
        py = rng.uniform(y0, y1)
        assert int(grid.cell_of_point(px, py, res)) in cells
    compacted = grid.compact(np.array(sorted(cells), dtype=np.int64))
    assert len(compacted) <= len(cells)
    # every original cell is itself in the compacted set or has an ancestor there
    comp = set(compacted.tolist())
    for c in cells:
        cur, ok = c, False
        for _ in range(res + 1):
            if cur in comp:
                ok = True
                break
            if grid.cell_res(cur) == 0:
                break
            cur = grid.parent(cur)
        assert ok


# --- CRS forward/inverse identity ----------------------------------------------
@settings(**SETTINGS)
@given(
    epsg=st.sampled_from([4326, 3857, 32633, 32610, 32733, 32756]),
    seed=st.integers(0, 2**31 - 1),
)
def test_crs_roundtrip_identity(epsg, seed):
    rng = np.random.default_rng(seed)
    if epsg in (32733, 32756):  # real UTM south: stay in-zone, southern lats
        lon0 = (epsg - 32700) * 6.0 - 183.0
        lon = lon0 + rng.uniform(-3, 3, 16)
        lat = rng.uniform(-79, -0.1, 16)
    elif 32601 <= epsg <= 32660:
        lon = crs.utm_lon0(epsg) + rng.uniform(-3, 3, 16)
        lat = rng.uniform(-84, 84, 16)
    else:
        lon = rng.uniform(-179, 179, 16)
        lat = rng.uniform(-84, 84, 16)
    x, y = crs.from_lonlat(epsg, lon, lat)
    lon2, lat2 = crs.to_lonlat(epsg, x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


# --- byte-range coalescing ------------------------------------------------------
@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1))
def test_coalesce_ranges_covers_and_bounds(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    offs = np.sort(rng.integers(0, 100_000, n))
    lens = rng.integers(1, 2_000, n)
    merged = mr.coalesce_ranges(offs, lens, gap=1024, max_per_batch=20)
    # every input range lands in exactly one batch and is fully covered by it
    seen = sorted(i for _, _, idxs in merged for i in idxs)
    assert seen == list(range(n))
    for mo, ms, idxs in merged:
        assert len(idxs) <= 20
        for i in idxs:
            assert mo <= offs[i] and offs[i] + lens[i] <= mo + ms
    assert len(merged) <= n


# --- fast LZW decoder parity --------------------------------------------------
@settings(**SETTINGS)
@given(data=st.binary(min_size=0, max_size=8192))
def test_lzw_fast_decode_matches_reference_loop(data):
    """The vectorized lzw_decode must be byte-identical to the per-symbol
    reference loop on well-formed streams AND truncated ones."""
    enc = codecs.lzw_encode(data)
    assert codecs.lzw_decode(enc, len(data)) == data
    assert codecs._lzw_decode_ref(enc, len(data)) == data
    # truncated expected (short-final-strip contract)
    for cut in (0, len(data) // 2):
        assert codecs.lzw_decode(enc, cut) == codecs._lzw_decode_ref(enc, cut)
    # truncated input stream (ran-out-of-bits contract)
    te = enc[: max(len(enc) // 2, 1)]
    assert codecs.lzw_decode(te, len(data)) == codecs._lzw_decode_ref(te, len(data))


@settings(**SETTINGS)
@given(blob=st.binary(min_size=1, max_size=256), expected=st.integers(0, 512))
def test_lzw_fast_decode_corrupt_stream_parity(blob, expected):
    """Arbitrary bytes: both decoders agree on output OR raise the same
    corrupt-stream error."""
    try:
        r1 = codecs.lzw_decode(blob, expected)
    except ValueError:
        r1 = "ERR"
    try:
        r2 = codecs._lzw_decode_ref(blob, expected)
    except ValueError:
        r2 = "ERR"
    assert r1 == r2
