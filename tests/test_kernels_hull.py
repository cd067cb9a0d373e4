"""QuickHull exact vertex-sequence parity vs the reference's tests.

Cases from ``geo/src/algorithm/convex_hull/qhull.rs:196-312`` and the
L-shape doctest at ``convex_hull/mod.rs:13-40``. The WKT fixture cases
(poly1/poly2) run in test_parity_reference.py.
"""

import numpy as np

from geo_spark.kernels import quick_hull
from geo_spark.kernels.area import ring_is_ccw, ring_signed_area


def _ring(pairs):
    return np.asarray(pairs, dtype=np.float64)


def test_l_shape_doctest():
    pts = _ring([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4), (0, 0)])
    expected = _ring([(4, 0), (4, 1), (1, 4), (0, 4), (0, 0), (4, 0)])
    got = quick_hull(pts)
    assert np.array_equal(got, expected)


def test_quick_hull_test2_octagon():
    pts = _ring(
        [(0, 10), (1, 1), (10, 0), (1, -1), (0, -10), (-1, -1), (-10, 0), (-1, 1), (0, 10)]
    )
    expected = _ring([(0, -10), (10, 0), (0, 10), (-10, 0), (0, -10)])
    got = quick_hull(pts)
    assert np.array_equal(got, expected)


def test_quick_hull_ccw():
    pts = _ring([(1.0, 0.0), (2.0, 1.0), (1.75, 1.1), (1.0, 2.0), (0.0, 1.0), (1.0, 0.0)])
    expected = _ring([(1.0, 0.0), (2.0, 1.0), (1.0, 2.0), (0.0, 1.0), (1.0, 0.0)])
    got = quick_hull(pts)
    assert np.array_equal(got, expected)


def test_quick_hull_ccw_maintain():
    pts = _ring(
        [(0, 0), (2, 0), (2.5, 1.75), (2.3, 1.7), (1.75, 2.5), (1.3, 2), (0, 2), (0, 0)]
    )
    got = quick_hull(pts)
    assert ring_is_ccw(got)
    assert _is_strictly_convex_ccw(got)


def test_quick_hull_collinear():
    # 3x3 grid with collinear triples: output must be strictly convex CCW,
    # middle collinear points excluded (qhull.rs:283-312)
    pts = _ring(
        [(-1, 0), (-1, -1), (-1, 1), (0, 0), (0, -1), (0, 1), (1, 0), (1, -1), (1, 1)]
    )
    got = quick_hull(pts)
    assert _is_strictly_convex_ccw(got)
    assert len(got) == 5  # 4 corners + closing point


def test_hull_indices_roundtrip():
    pts = _ring([(0, 0), (10, 0), (10, 10), (0, 10), (5, 5)])
    ring, idx = quick_hull(pts, return_indices=True)
    assert idx[0] == idx[-1]
    rebuilt = pts[idx]
    assert np.array_equal(rebuilt, ring)
    assert 4 not in idx[:-1]  # interior point excluded


def test_trivial_hulls():
    one = quick_hull(_ring([(1, 1)]))
    assert np.array_equal(one, _ring([(1, 1), (1, 1), (1, 1)])) or len(one) >= 2
    three = quick_hull(_ring([(0, 0), (1, 1), (2, 2)]))  # collinear triple
    # middle point dropped
    assert not any((p == (1.0, 1.0)).all() for p in three[:-1]) or len(three) == 3


def _is_strictly_convex_ccw(ring: np.ndarray) -> bool:
    from geo_spark.kernels import orient2d

    assert (ring[0] == ring[-1]).all()
    open_ring = ring[:-1]
    n = len(open_ring)
    if ring_signed_area(ring) <= 0:
        return False
    for i in range(n):
        a = open_ring[i]
        b = open_ring[(i + 1) % n]
        c = open_ring[(i + 2) % n]
        if int(orient2d(a[0], a[1], b[0], b[1], c[0], c[1])) <= 0:
            return False
    return True
