"""StitchTriangles parity (stitch.rs:25): shared edges cancel, boundary
assembles back to the original multipolygon, holes preserved."""

import numpy as np
import pytest

from geo_spark.kernels.boolops import overlay_area
from geo_spark.kernels.geom2 import triangulate_earcut, validate_multipolygon
from geo_spark.kernels.stitch import stitch_triangles
from geo_spark.kernels.triangulate import delaunay


def test_stitch_two_triangles_to_square():
    # the stitch.rs doctest square
    tris = [
        np.array([(0, 0), (1, 0), (0, 1)], float),
        np.array([(1, 1), (1, 0), (0, 1)], float),
    ]
    r = stitch_triangles(tris)
    assert len(r) == 1 and len(r[0][1]) == 0
    assert overlay_area(r) == pytest.approx(1.0)


def test_stitch_mixed_winding():
    tris = [
        np.array([(0, 0), (1, 0), (0, 1)], float),
        np.array([(1, 1), (0, 1), (1, 0)], float),  # opposite winding
    ]
    assert overlay_area(stitch_triangles(tris)) == pytest.approx(1.0)


def test_stitch_delaunay_of_grid():
    pts = np.array([(x, y) for x in range(5) for y in range(5)], float)
    tris = [pts[list(t)] for t in delaunay(pts)]
    r = stitch_triangles(tris)
    assert len(r) == 1
    assert overlay_area(r) == pytest.approx(16.0)
    assert validate_multipolygon(r) == []


def test_stitch_earcut_roundtrip_with_hole():
    ext = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], float)
    verts = ext[:-1]
    tris = [verts[list(t)] for t in triangulate_earcut(ext)]
    r = stitch_triangles(tris)
    assert overlay_area(r) == pytest.approx(100.0)
    assert validate_multipolygon(r) == []
