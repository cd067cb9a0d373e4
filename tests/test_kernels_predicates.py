"""Parity tests for orient2d / ring & polygon position.

Cases ported from the reference's own unit tests:
``geo/src/algorithm/coordinate_position.rs:457-539`` (square, vertex, edge,
hole semantics) and doctest ``:21-35``.
"""

import numpy as np

from geo_spark.kernels import (
    INSIDE,
    ON_BOUNDARY,
    OUTSIDE,
    orient2d,
    polygon_position,
    ring_position,
)
from geo_spark.kernels.predicates import (
    multipolygon_position,
    polygon_contains_point,
    segments_intersect,
)

SQUARE = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])
# square with a hole in the middle (hole wound opposite)
OUTER = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
HOLE = np.array([[1.0, 1.0], [1.0, 3.0], [3.0, 3.0], [3.0, 1.0], [1.0, 1.0]])


def test_orient2d_basic():
    assert orient2d(0, 0, 1, 0, 0, 1) == 1  # CCW
    assert orient2d(0, 0, 0, 1, 1, 0) == -1  # CW
    assert orient2d(0, 0, 1, 1, 2, 2) == 0  # collinear


def test_orient2d_near_degenerate_exact():
    # A classic adaptive-precision stress: tiny perturbations around collinear.
    a = (0.5, 0.5)
    b = (12.0, 12.0)
    base = 0.5
    eps = np.finfo(np.float64).eps
    for k in range(-2, 3):
        c = base + k * eps * base
        got = int(orient2d(a[0], a[1], b[0], b[1], c, c))
        assert got == 0  # points on y=x are exactly collinear
    # one ulp off the diagonal in y must be detected
    c = np.nextafter(0.5, 1.0)
    assert int(orient2d(a[0], a[1], b[0], b[1], 0.5, c)) != 0


def test_ring_position_square():
    px = np.array([1.0, 3.0, 1.0, 0.0, 2.0, 0.0, -1.0])
    py = np.array([1.0, 1.0, 0.0, 0.0, 2.0, 1.0, 0.0])
    got = ring_position(px, py, SQUARE)
    exp = np.array([INSIDE, OUTSIDE, ON_BOUNDARY, ON_BOUNDARY, ON_BOUNDARY, ON_BOUNDARY, OUTSIDE])
    assert (got == exp).all()


def test_ring_position_vertex_and_horizontal_edge():
    # on a vertex (local max/min) and on horizontal edges
    assert ring_position([2.0], [2.0], SQUARE)[0] == ON_BOUNDARY
    assert ring_position([1.0], [2.0], SQUARE)[0] == ON_BOUNDARY  # top edge
    assert ring_position([1.0], [0.0], SQUARE)[0] == ON_BOUNDARY  # bottom edge


def test_polygon_with_hole():
    # in-hole → Outside; on hole boundary → OnBoundary; in shell ring → Inside
    px = np.array([2.0, 1.0, 0.5, 2.0, 0.0, 5.0])
    py = np.array([2.0, 2.0, 0.5, 0.5, 0.0, 5.0])
    got = polygon_position(px, py, OUTER, [HOLE])
    exp = np.array([OUTSIDE, ON_BOUNDARY, INSIDE, INSIDE, ON_BOUNDARY, OUTSIDE])
    assert (got == exp).all()


def test_contains_is_strict_interior():
    # contains = strictly inside (contains/polygon.rs:17-21)
    assert polygon_contains_point([1.0], [1.0], SQUARE)[0]
    assert not polygon_contains_point([0.0], [0.0], SQUARE)[0]
    assert not polygon_contains_point([3.0], [3.0], SQUARE)[0]


def test_multipolygon_mod2_boundary():
    # two squares sharing the edge x=2: a point on the shared edge touches two
    # boundaries → even count → NOT boundary under the OGC mod-2 rule, and
    # not inside either square's interior... it's on both boundaries, count=2
    # → Outside per mod-2. A point on an unshared edge (count=1) → boundary.
    sq2 = SQUARE + np.array([2.0, 0.0])
    polys = [(SQUARE, []), (sq2, [])]
    assert multipolygon_position([2.0], [1.0], polys)[0] == OUTSIDE
    assert multipolygon_position([0.0], [1.0], polys)[0] == ON_BOUNDARY
    assert multipolygon_position([1.0], [1.0], polys)[0] == INSIDE
    assert multipolygon_position([3.0], [1.0], polys)[0] == INSIDE


def test_winding_direction_irrelevant():
    # ring orientation must not affect position results (nonzero rule)
    cw = SQUARE[::-1].copy()
    px = np.array([1.0, 3.0, 0.0])
    py = np.array([1.0, 1.0, 1.0])
    assert (ring_position(px, py, cw) == ring_position(px, py, SQUARE)).all()


def test_segments_intersect():
    # crossing
    assert segments_intersect(0, 0, 2, 2, 0, 2, 2, 0)[()]
    # touching at endpoint
    assert segments_intersect(0, 0, 1, 1, 1, 1, 2, 0)[()]
    # collinear overlap
    assert segments_intersect(0, 0, 2, 0, 1, 0, 3, 0)[()]
    # collinear disjoint
    assert not segments_intersect(0, 0, 1, 0, 2, 0, 3, 0)[()]
    # parallel
    assert not segments_intersect(0, 0, 2, 0, 0, 1, 2, 1)[()]
