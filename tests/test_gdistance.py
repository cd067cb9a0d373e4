"""Geometry-pair distance / IsSimple / Boundary kernels (corpus-backed by
test_jts_conformance; these pin the kernel semantics directly)."""

import numpy as np

from geo_spark.kernels.gdistance import boundary, geometry_distance, is_simple


def _poly(x0, y0, x1, y1):
    return ("Polygon", [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)])


def _line(*pts):
    return ("LineString", np.array(pts, float))


def test_distance_basic():
    assert geometry_distance(("Point", np.array([0.0, 0.0])), ("Point", np.array([3.0, 4.0]))) == 5.0
    assert geometry_distance(_poly(0, 0, 1, 1), _poly(3, 0, 4, 1)) == 2.0
    assert geometry_distance(_poly(0, 0, 4, 4), ("Point", np.array([2.0, 2.0]))) == 0.0  # inside
    assert geometry_distance(_line((0, 0), (10, 0)), ("Point", np.array([5.0, 3.0]))) == 3.0
    # crossing lines → 0
    assert geometry_distance(_line((0, 0), (2, 2)), _line((0, 2), (2, 0))) == 0.0


def test_is_simple_rules():
    assert is_simple(_line((0, 0), (1, 1), (2, 0)))
    ring = _line((0, 0), (1, 0), (1, 1), (0, 1), (0, 0))
    assert is_simple(ring)  # closure is not a self-intersection
    assert not is_simple(_line((0, 0), (2, 2), (2, 0), (0, 2)))  # crossing
    # endpoint touching own interior vertex (JTS: not simple)
    assert not is_simple(_line((20, 60), (60, 60), (100, 60), (60, 100), (60, 60)))
    # two open lines meeting at mutual endpoints: simple
    ml = ("MultiLineString", [np.array([(0, 0), (1, 1)], float), np.array([(1, 1), (2, 0)], float)])
    assert is_simple(ml)
    # two closed rings sharing a point: not simple
    ml2 = ("MultiLineString", [
        np.array([(80, 160), (40, 220), (40, 100), (80, 160)], float),
        np.array([(80, 160), (120, 220), (120, 100), (80, 160)], float),
    ])
    assert not is_simple(ml2)
    # bowtie polygon ring: not simple
    assert not is_simple(("Polygon", [np.array([(100, 100), (100, 200), (200, 100), (200, 200), (100, 100)], float)]))


def test_boundary_rules():
    pts, segs = boundary(_line((0, 0), (1, 0), (2, 0)))
    assert pts == {(0.0, 0.0), (2.0, 0.0)} and not segs
    pts, segs = boundary(_line((0, 0), (1, 0), (1, 1), (0, 0)))  # closed → empty
    assert not pts and not segs
    pts, segs = boundary(_poly(0, 0, 1, 1))
    assert not pts and len(segs) == 4


def test_is_simple_repeated_consecutive_vertex():
    # zero-length segments must not desynchronize the joint/closure
    # exemptions (JTS: LINESTRING(0 0,1 1,1 1,2 2) is simple)
    assert is_simple(_line((0, 0), (1, 1), (1, 1), (2, 2)))
    # closed ring with a doubled vertex is still a simple closed curve
    assert is_simple(_line((0, 0), (1, 0), (1, 0), (1, 1), (0, 1), (0, 0)))
    # a real crossing is still caught when repeated vertices are present
    assert not is_simple(_line((0, 0), (2, 2), (2, 2), (2, 0), (0, 2)))
