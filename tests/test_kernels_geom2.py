"""Tests for triangulation / interior point / validation / spherical area."""

import numpy as np
import pytest

from geo_spark.kernels.area import polygon_unsigned_area, ring_signed_area
from geo_spark.kernels.geom2 import (
    chamberlain_duquette_area,
    dimensions,
    haversine_intermediate,
    haversine_length,
    interior_point,
    rhumb_destination,
    triangulate_earcut,
    validate_polygon,
    vincenty_length,
)
from geo_spark.kernels.measures import haversine_distance, vincenty_distance
from geo_spark.kernels.predicates import polygon_contains_point


def _ring(pairs):
    return np.asarray(pairs, dtype=np.float64)


SQUARE = _ring([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
L_SHAPE = _ring([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4), (0, 0)])
O2 = _ring(
    [
        (0.00388383, 51.501574),
        (0.00538587, 51.502278),
        (0.00553607, 51.503299),
        (0.00467777, 51.504181),
        (0.00327229, 51.504435),
        (0.00187754, 51.504168),
        (0.00087976, 51.503380),
        (0.00107288, 51.502324),
        (0.00185608, 51.501770),
        (0.00388383, 51.501574),
    ]
)


def _tri_area_sum(ring, tris):
    total = 0.0
    open_ring = ring[:-1]
    for a, b, c in tris:
        pa, pb, pc = open_ring[a], open_ring[b], open_ring[c]
        total += abs(
            (pb[0] - pa[0]) * (pc[1] - pa[1]) - (pb[1] - pa[1]) * (pc[0] - pa[0])
        ) / 2.0
    return total


def test_earcut_square():
    tris = triangulate_earcut(SQUARE)
    assert len(tris) == 2
    assert _tri_area_sum(SQUARE, tris) == 16.0


def test_earcut_concave():
    tris = triangulate_earcut(L_SHAPE)
    assert len(tris) == 4  # n-2 for 6 vertices
    assert _tri_area_sum(L_SHAPE, tris) == pytest.approx(7.0)


def test_earcut_cw_input():
    tris = triangulate_earcut(SQUARE[::-1].copy())
    assert len(tris) == 2
    assert _tri_area_sum(SQUARE, tris) == 16.0


def test_interior_point_convex_and_concave():
    for ring in (SQUARE, L_SHAPE):
        p = interior_point(ring)
        assert polygon_contains_point([p[0]], [p[1]], ring)[0]


def test_interior_point_with_hole_covering_centroid():
    outer = _ring([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    hole = _ring([(3, 3), (3, 7), (7, 7), (7, 3), (3, 3)])  # centroid inside hole
    p = interior_point(outer, [hole])
    assert polygon_contains_point([p[0]], [p[1]], outer, [hole])[0]


def test_validation():
    assert validate_polygon(SQUARE) == []
    bowtie = _ring([(0, 0), (4, 4), (4, 0), (0, 4), (0, 0)])
    assert any("self-intersection" in p for p in validate_polygon(bowtie))
    open_ring = _ring([(0, 0), (4, 0), (4, 4), (0, 4)])
    assert any("not closed" in p for p in validate_polygon(open_ring))
    tiny = _ring([(0, 0), (1, 1), (0, 0)])
    assert any("too few" in p for p in validate_polygon(tiny))
    # hole outside shell
    far_hole = _ring([(20, 20), (21, 20), (21, 21), (20, 21), (20, 20)])
    assert any("outside" in p for p in validate_polygon(SQUARE, [far_hole]))
    # nested holes
    h1 = _ring([(1, 1), (1, 3), (3, 3), (3, 1), (1, 1)])
    h2 = _ring([(1.5, 1.5), (1.5, 2.5), (2.5, 2.5), (2.5, 1.5), (1.5, 1.5)])
    assert any("nested" in p for p in validate_polygon(SQUARE, [h1, h2]))


def test_chamberlain_duquette_o2_golden():
    # chamberlain_duquette_area.rs doctest: O2 London = 78,478 m²
    assert round(chamberlain_duquette_area(O2)) == 78_478
    assert round(chamberlain_duquette_area(O2[::-1].copy())) == -78_478


def test_dimensions():
    assert dimensions("point", [(1, 2)]) == 0
    assert dimensions("linestring", [(0, 0), (1, 1)]) == 1
    assert dimensions("linestring", [(1, 1), (1, 1)]) == 0  # degenerate
    assert dimensions("polygon", SQUARE) == 2
    assert dimensions("multipoint", []) == -1


def test_lengths():
    line = _ring([(-74.006, 40.7128), (-0.1278, 51.5074)])
    assert round(vincenty_length(line)) == 5_585_234
    assert round(haversine_length(line)) == 5_570_230
    # two-hop equals sum of hops
    three = _ring([(0, 0), (1, 0), (2, 0)])
    assert haversine_length(three) == pytest.approx(
        float(
            haversine_distance(0, 0, 1, 0) + haversine_distance(1, 0, 2, 0)
        )
    )


def test_rhumb_destination_roundtrip():
    from geo_spark.kernels.measures import rhumb_bearing, rhumb_distance

    lon1, lat1 = 9.177, 48.776
    lon2, lat2 = 10.2, 49.3
    d = float(rhumb_distance(lon1, lat1, lon2, lat2))
    b = float(rhumb_bearing(lon1, lat1, lon2, lat2))
    glon, glat = rhumb_destination(lon1, lat1, b, d)
    assert float(glon) == pytest.approx(lon2, abs=1e-9)
    assert float(glat) == pytest.approx(lat2, abs=1e-9)


def test_haversine_intermediate():
    lon, lat = haversine_intermediate(0.0, 0.0, 10.0, 0.0, 0.5)
    assert float(lon) == pytest.approx(5.0, abs=1e-9)
    assert float(lat) == pytest.approx(0.0, abs=1e-9)
    # endpoint fractions
    lon0, lat0 = haversine_intermediate(-74.006, 40.7128, -0.1278, 51.5074, 0.0)
    assert float(lon0) == pytest.approx(-74.006, abs=1e-9)
    assert float(lat0) == pytest.approx(40.7128, abs=1e-9)
