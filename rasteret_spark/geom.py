"""Minimal vectorized geometry kernels: WKB codec, bbox, ray-cast PIP.

No shapely/GEOS in this environment; the engine carries footprints and AOIs
as standard WKB binary columns (little-endian Point / Polygon / MultiPolygon)
and evaluates containment with an even-odd ray-cast — the same exact-refine
predicate the reference applies after bbox pruning (rasteret evaluates
polygon masks via rasterio `geometry_mask`; here the join refine only needs
point-in-polygon and rectangle-polygon tests).

All predicates are numpy-vectorized over arrays of points against one
polygon; they are called from Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6


# --- encoding ----------------------------------------------------------------
def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: list of (n,2) float64 arrays, closed or not (auto-closed)."""
    out = bytearray(struct.pack("<BII", 1, WKB_POLYGON, len(rings)))
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out += struct.pack("<I", len(ring))
        out += np.ascontiguousarray(ring).tobytes()
    return bytes(out)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = bytearray(struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys)))
    for rings in polys:
        out += wkb_polygon(rings)
    return bytes(out)


def wkb_box(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    return wkb_polygon(
        [np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])]
    )


# --- decoding ----------------------------------------------------------------
def _parse_polygon(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    endian = buf[off]
    assert endian == 1, "big-endian WKB unsupported"
    gtype, nrings = struct.unpack_from("<II", buf, off + 1)
    assert gtype == WKB_POLYGON
    off += 9
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        pts = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off).reshape(npts, 2)
        rings.append(pts.copy())
        off += npts * 16
    return rings, off


def parse_wkb(buf: bytes):
    """WKB -> ("point", (x, y)) | ("polygon", [rings]) | ("multipolygon", [[rings]...])."""
    endian = buf[0]
    assert endian == 1
    (gtype,) = struct.unpack_from("<I", buf, 1)
    if gtype == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, 5)
        return "point", (x, y)
    if gtype == WKB_POLYGON:
        rings, _ = _parse_polygon(buf, 0)
        return "polygon", rings
    if gtype == WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from("<I", buf, 5)
        off = 9
        polys = []
        for _ in range(npolys):
            rings, off = _parse_polygon(buf, off)
            polys.append(rings)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def polygons_of(buf: bytes) -> list[list[np.ndarray]]:
    """Normalize any supported geometry to a list of polygons (ring lists)."""
    kind, data = parse_wkb(buf)
    if kind == "polygon":
        return [data]
    if kind == "multipolygon":
        return data
    raise ValueError("expected (multi)polygon WKB")


def wkb_bbox(buf: bytes) -> tuple[float, float, float, float]:
    kind, data = parse_wkb(buf)
    if kind == "point":
        x, y = data
        return x, y, x, y
    polys = [data] if kind == "polygon" else data
    all_pts = np.vstack([r for rings in polys for r in rings])
    return (
        float(all_pts[:, 0].min()),
        float(all_pts[:, 1].min()),
        float(all_pts[:, 0].max()),
        float(all_pts[:, 1].max()),
    )


# --- predicates ---------------------------------------------------------------
def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast: bool mask of points strictly-or-boundary inside ring.

    Half-open edge rule (y0 <= y < y1 crossing test) gives consistent results
    for points on horizontal boundaries; vertical-boundary points count as
    inside when the ray-x comparison is <=.
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / np.where(y1 == y0, np.inf, y1 - y0)
    hits = crosses & (px <= xint)
    return hits.sum(axis=1) % 2 == 1


def points_in_polygon_wkb(px: np.ndarray, py: np.ndarray, buf: bytes) -> np.ndarray:
    """Vectorized PIP for polygon/multipolygon WKB (even-odd: holes excluded)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    for rings in polygons_of(buf):
        poly_in = np.zeros(px.shape[0], dtype=bool)
        for ring in rings:
            poly_in ^= points_in_ring(px, py, ring)
        inside |= poly_in
    return inside


def _segments_intersect(a0, a1, b0, b1) -> bool:
    def orient(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    d1, d2 = orient(b0, b1, a0), orient(b0, b1, a1)
    d3, d4 = orient(a0, a1, b0), orient(a0, a1, b1)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    return False


def rect_intersects_polygon(
    xmin: float, ymin: float, xmax: float, ymax: float, buf: bytes
) -> bool:
    """Exact rectangle x polygon intersection (for tight cell covers)."""
    polys = polygons_of(buf)
    corners = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )
    # any rect corner inside polygon
    if points_in_polygon_wkb(corners[:, 0], corners[:, 1], buf).any():
        return True
    rect_edges = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    for rings in polys:
        for ring in rings:
            # any polygon vertex inside rect
            vin = (
                (ring[:, 0] >= xmin)
                & (ring[:, 0] <= xmax)
                & (ring[:, 1] >= ymin)
                & (ring[:, 1] <= ymax)
            )
            if vin.any():
                return True
            # any edge pair crossing
            for i in range(len(ring) - 1):
                for e0, e1 in rect_edges:
                    if _segments_intersect(ring[i], ring[i + 1], e0, e1):
                        return True
    return False
