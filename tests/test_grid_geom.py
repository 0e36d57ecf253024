"""Unit tests for the quadtree cell grid and WKB/PIP geometry kernels."""

import numpy as np

from rasteret_spark import geom, grid


def test_cell_roundtrip():
    c = grid.cell_of_point(np.array([12.5]), np.array([-33.2]), 9)[0]
    assert int(grid.cell_res(c)) == 9
    x0, y0, x1, y1 = grid.cell_bounds(c)
    assert x0 <= 12.5 < x1 and y0 <= -33.2 < y1


def test_parent_child_consistency():
    c = int(grid.cell_of_point(np.array([100.0]), np.array([45.0]), 10)[0])
    p = int(grid.parent(np.int64(c)))
    assert c in grid.children(p)
    assert int(grid.cell_res(np.int64(p))) == 9


def test_ancestors_chain():
    c = grid.cell_of_point(np.array([1.0]), np.array([1.0]), 5)
    chain = grid.ancestors(c, min_res=2)
    assert len(chain) == 4  # res 5,4,3,2
    assert [int(grid.cell_res(a)[0]) for a in chain] == [5, 4, 3, 2]


def test_k_ring_size_and_wrap():
    c = int(grid.cell_of_point(np.array([0.0]), np.array([0.0]), 6)[0])
    ring = grid.k_ring(c, 1)
    assert len(ring) == 9
    assert c in ring
    # antimeridian wrap: cell at ix=0 still has 9 neighbours
    edge = int(grid.cell_id(6, 0, 30))
    assert len(grid.k_ring(edge, 1)) == 9
    # pole clamp: iy=0 loses a row
    pole = int(grid.cell_id(6, 5, 0))
    assert len(grid.k_ring(pole, 1)) == 6


def test_ring_distance_wraps():
    a = grid.cell_id(6, 0, 10)
    b = grid.cell_id(6, 63, 10)
    assert int(grid.ring_distance(a, b)) == 1


def test_cover_bbox_and_compact_uncompact():
    cells = grid.cover_bbox(-1.0, -1.0, 1.0, 1.0, 8)
    x0, y0, x1, y1 = grid.cell_bounds(cells)
    assert (x1 >= -1.0).all() and (x0 <= 1.0).all()
    # a full parent block compacts
    p = int(grid.cell_id(4, 3, 7))
    kids = np.array(grid.children(p), dtype=np.int64)
    comp = grid.compact(kids)
    assert list(comp) == [p]
    assert sorted(grid.uncompact(comp, 5)) == sorted(kids)


def test_compact_partial_blocks_stay():
    p = int(grid.cell_id(4, 3, 7))
    kids = np.array(grid.children(p)[:3], dtype=np.int64)
    comp = grid.compact(kids)
    assert sorted(comp) == sorted(kids)


def test_compact_recursive():
    gp = int(grid.cell_id(3, 1, 1))
    level2 = []
    for k in grid.children(gp):
        level2.extend(grid.children(k))
    comp = grid.compact(np.array(level2, dtype=np.int64))
    assert list(comp) == [gp]


def test_wkb_point_polygon_roundtrip():
    pt = geom.wkb_point(3.5, -7.25)
    assert geom.parse_wkb(pt) == ("point", (3.5, -7.25))
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    poly = geom.wkb_polygon([ring])
    kind, rings = geom.parse_wkb(poly)
    assert kind == "polygon" and len(rings) == 1 and len(rings[0]) == 5
    assert geom.wkb_bbox(poly) == (0.0, 0.0, 4.0, 4.0)


def test_pip_square_with_hole():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)
    poly = geom.wkb_polygon([outer, hole])
    px = np.array([5.0, 2.0, 11.0, 5.0])
    py = np.array([5.0, 2.0, 5.0, 3.0])
    got = geom.points_in_polygon_wkb(px, py, poly)
    assert list(got) == [False, True, False, True]  # hole, inside, outside, inside


def test_pip_multipolygon():
    a = [np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)]
    b = [np.array([[10, 10], [12, 10], [12, 12], [10, 12]], dtype=float)]
    mp = geom.wkb_multipolygon([a, b])
    px = np.array([1.0, 11.0, 5.0])
    py = np.array([1.0, 11.0, 5.0])
    assert list(geom.points_in_polygon_wkb(px, py, mp)) == [True, True, False]


def test_pip_matches_matplotlib_style_oracle():
    rng = np.random.default_rng(7)
    ring = np.array([[0, 0], [8, 1], [9, 7], [4, 9], [-1, 5]], dtype=float)
    poly = geom.wkb_polygon([ring])
    px = rng.uniform(-2, 10, 500)
    py = rng.uniform(-2, 10, 500)
    got = geom.points_in_polygon_wkb(px, py, poly)
    # independent scalar even-odd implementation as oracle
    closed = np.vstack([ring, ring[:1]])

    def inside(x, y):
        c = False
        for i in range(len(closed) - 1):
            x0, y0 = closed[i]
            x1, y1 = closed[i + 1]
            if (y0 > y) != (y1 > y) and x <= x0 + (y - y0) * (x1 - x0) / (y1 - y0):
                c = not c
        return c

    want = np.array([inside(x, y) for x, y in zip(px, py)])
    assert (got == want).all()


def test_rect_intersects_polygon_cases():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    poly = geom.wkb_polygon([ring])
    assert geom.rect_intersects_polygon(2, 2, 3, 3, poly)  # rect inside poly
    assert geom.rect_intersects_polygon(-5, -5, 20, 20, poly)  # poly inside rect
    assert geom.rect_intersects_polygon(9, 9, 12, 12, poly)  # corner overlap
    assert not geom.rect_intersects_polygon(11, 11, 12, 12, poly)  # disjoint
    # crossing without any vertex containment
    assert geom.rect_intersects_polygon(-1, 4, 11, 6, poly)
