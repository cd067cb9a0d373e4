"""General polygon boolean overlay tests (reference doctest shapes + identities)."""

import numpy as np
import pytest

from geo_spark.kernels.area import polygon_unsigned_area, ring_signed_area
from geo_spark.kernels.boolops import boolean_op, overlay_area
from geo_spark.kernels.clip import rect_clip_area


def _ring(pairs):
    return np.asarray(pairs, dtype=np.float64)


def sq(x0, y0, s):
    return _ring([(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)])


A10 = sq(0, 0, 10)
B10 = sq(5, 5, 10)  # overlaps A by a 5x5 square


def _area(op, a_ext, a_holes, b_ext, b_holes):
    return overlay_area(boolean_op(a_ext, a_holes, b_ext, b_holes, op))


def test_two_overlapping_squares_doctest():
    # bool_ops/mod.rs:86-90 shapes: union=1 polygon (area 175), ∩=5x5
    union = boolean_op(A10, [], B10, [], "union")
    inter = boolean_op(A10, [], B10, [], "intersection")
    assert len(union) == 1
    assert overlay_area(union) == pytest.approx(175.0)
    assert len(inter) == 1
    assert overlay_area(inter) == pytest.approx(25.0)
    # intersection ring is the 5..10 square
    got = inter[0][0]
    assert abs(ring_signed_area(got)) == 25.0
    xs = sorted(set(got[:, 0]))
    assert xs == [5.0, 10.0]


def test_difference_and_xor():
    assert _area("difference", A10, [], B10, []) == pytest.approx(75.0)
    assert _area("difference", B10, [], A10, []) == pytest.approx(75.0)
    assert _area("xor", A10, [], B10, []) == pytest.approx(150.0)


def test_area_identities_random_convex():
    rng = np.random.RandomState(9)
    from geo_spark.kernels.hull import quick_hull

    for trial in range(8):
        a = quick_hull(rng.uniform(0, 10, (12, 2)))
        b = quick_hull(rng.uniform(3, 13, (12, 2)))
        ia = _area("intersection", a, [], b, [])
        un = _area("union", a, [], b, [])
        da = _area("difference", a, [], b, [])
        xo = _area("xor", a, [], b, [])
        area_a = abs(ring_signed_area(a))
        area_b = abs(ring_signed_area(b))
        assert un == pytest.approx(area_a + area_b - ia, rel=1e-9)
        assert da == pytest.approx(area_a - ia, rel=1e-9)
        assert xo == pytest.approx(un - ia, rel=1e-9)


def test_intersection_matches_rect_clip():
    # clip window = axis-aligned rect: overlay must equal Sutherland-Hodgman
    l_shape = _ring([(0, 0), (8, 0), (8, 2), (2, 2), (2, 8), (0, 8), (0, 0)])
    for rect in [(1, 1, 6, 6), (-2, -2, 3, 3), (2.5, 0.5, 7.5, 1.5)]:
        window = _ring(
            [
                (rect[0], rect[1]),
                (rect[2], rect[1]),
                (rect[2], rect[3]),
                (rect[0], rect[3]),
                (rect[0], rect[1]),
            ]
        )
        got = _area("intersection", l_shape, [], window, [])
        exp = rect_clip_area(l_shape, *rect)
        assert got == pytest.approx(exp, rel=1e-12)


def test_disjoint_and_contained():
    far = sq(100, 100, 5)
    assert _area("intersection", A10, [], far, []) == 0.0
    assert _area("union", A10, [], far, []) == pytest.approx(125.0)
    assert len(boolean_op(A10, [], far, [], "union")) == 2
    small = sq(2, 2, 3)
    assert _area("intersection", A10, [], small, []) == pytest.approx(9.0)
    # A \ contained-B → square with a hole
    diff = boolean_op(A10, [], small, [], "difference")
    assert overlay_area(diff) == pytest.approx(91.0)
    assert len(diff) == 1
    assert len(diff[0][1]) == 1  # one hole


def test_shared_edge_union():
    left = sq(0, 0, 10)
    right = sq(10, 0, 10)
    union = boolean_op(left, [], right, [], "union")
    assert overlay_area(union) == pytest.approx(200.0)
    assert len(union) == 1
    inter = boolean_op(left, [], right, [], "intersection")
    assert overlay_area(inter) == 0.0


def test_identical_polygons():
    assert _area("union", A10, [], A10, []) == pytest.approx(100.0)
    assert _area("intersection", A10, [], A10, []) == pytest.approx(100.0)
    assert _area("difference", A10, [], A10, []) == 0.0
    assert _area("xor", A10, [], A10, []) == 0.0


def test_with_holes():
    outer = sq(0, 0, 10)
    hole = sq(4, 4, 2)[::-1].copy()  # CW hole
    b = sq(3, 3, 4)  # covers the hole entirely
    inter = _area("intersection", outer, [hole], b, [])
    assert inter == pytest.approx(16.0 - 4.0)
    union = _area("union", outer, [hole], b, [])
    assert union == pytest.approx(100.0)  # B fills the hole exactly? no: B is 4x4 over hole 2x2
    diff = _area("difference", outer, [hole], b, [])
    assert diff == pytest.approx(96.0 - 12.0)


def test_concave_cross_shapes():
    plus = _ring(
        [(2, 0), (4, 0), (4, 2), (6, 2), (6, 4), (4, 4), (4, 6), (2, 6), (2, 4), (0, 4), (0, 2), (2, 2), (2, 0)]
    )
    bar = _ring([(-1, 2.5), (7, 2.5), (7, 3.5), (-1, 3.5), (-1, 2.5)])
    ia = _area("intersection", plus, [], bar, [])
    assert ia == pytest.approx(6.0)  # bar crosses full 6-wide middle row
    un = _area("union", plus, [], bar, [])
    plus_area = abs(ring_signed_area(plus))
    assert un == pytest.approx(plus_area + 8.0 - 6.0)


def test_unary_union_grid():
    from geo_spark.kernels.boolops import unary_union

    tiles = [(sq(i * 10, 0, 10), []) for i in range(4)]  # 4 adjacent squares
    u = unary_union(tiles)
    assert overlay_area(u) == pytest.approx(400.0)
    assert len(u) == 1
    # disjoint pieces stay separate
    far = unary_union([(sq(0, 0, 1), []), (sq(5, 5, 1), []), (sq(9, 9, 1), [])])
    assert len(far) == 3
    assert overlay_area(far) == pytest.approx(3.0)


def test_clip_lines_by_polygon():
    from geo_spark.kernels.boolops import clip_lines_by_polygon

    poly = sq(0, 0, 10)
    line = _ring([(-5, 5), (15, 5)])  # crosses straight through
    inside = clip_lines_by_polygon(line, poly)
    assert len(inside) == 1
    seg = inside[0]
    assert seg[0].tolist() == [0.0, 5.0] and seg[-1].tolist() == [10.0, 5.0]
    outside = clip_lines_by_polygon(line, poly, invert=True)
    total_out = sum(np.hypot(*np.diff(p, axis=0).T).sum() for p in outside)
    assert total_out == pytest.approx(10.0)
    # zig-zag in and out
    zz = _ring([(-2, 2), (5, 2), (5, -2), (8, -2), (8, 2), (12, 2)])
    ins = clip_lines_by_polygon(zz, poly)
    total_in = sum(np.hypot(*np.diff(p, axis=0).T).sum() for p in ins)
    # inside spans: x 0..5 (5) + y 0..2 (2) + y 0..2 (2) + x 8..10 (2)
    assert total_in == pytest.approx(5.0 + 2.0 + 2.0 + 2.0)


def test_multipolygon_ops():
    from geo_spark.kernels.boolops import multipolygon_boolean_op

    a = [(sq(0, 0, 4), []), (sq(10, 0, 4), [])]
    b = [(sq(2, 0, 4), [])]
    un = multipolygon_boolean_op(a, b, "union")
    assert overlay_area(un) == pytest.approx(16 + 16 + 16 - 8)
    inter = multipolygon_boolean_op(a, b, "intersection")
    assert overlay_area(inter) == pytest.approx(8.0)
    diff = multipolygon_boolean_op(a, b, "difference")
    assert overlay_area(diff) == pytest.approx(32 - 8)
