"""Golden-value parity for the distance kernels.

Goldens are the reference's own doctests (see BASELINE.md):
haversine.rs:24-31,254-262; vincenty_distance.rs:36; rhumb distance tests.
"""

import numpy as np
import pytest

from geo_spark.kernels import (
    cross_track_distance,
    euclidean_distance,
    haversine_bearing,
    haversine_destination,
    haversine_distance,
    rhumb_distance,
    vincenty_distance,
)

NYC = (-74.006, 40.7128)
LONDON = (-0.1278, 51.5074)


def test_haversine_nyc_london():
    d = haversine_distance(NYC[0], NYC[1], LONDON[0], LONDON[1])
    assert round(float(d)) == 5_570_230


def test_haversine_sofia_plovdiv():
    d = haversine_distance(23.319941, 42.698334, 24.742168, 42.136097)
    assert float(d) == pytest.approx(132433.09929460194, rel=1e-12)


def test_vincenty_nyc_london():
    d = vincenty_distance(NYC[0], NYC[1], LONDON[0], LONDON[1])
    assert round(float(d)) == 5_585_234


def test_vincenty_coincident_and_antipodal():
    assert float(vincenty_distance(10.0, 10.0, 10.0, 10.0)) == 0.0
    assert np.isnan(float(vincenty_distance(0.0, 0.0, 180.0, 0.0)))


def test_rhumb_nyc_london():
    d = rhumb_distance(NYC[0], NYC[1], LONDON[0], LONDON[1])
    assert round(float(d)) == 5_794_129


def test_rhumb_reference_cases():
    # rhumb/distance.rs tests
    assert float(rhumb_distance(0.0, 0.0, 1.0, 0.0)) == pytest.approx(
        111195.0802335329, abs=1e-6
    )
    assert float(rhumb_distance(-72.1235, 42.3521, 72.1260, 70.612)) == pytest.approx(
        8903668.508603323, abs=1e-6
    )
    assert float(rhumb_distance(-77.036585, 38.897448, -77.009080, 38.889825)) == pytest.approx(
        2526.823513863995, abs=1e-6
    )


def test_euclidean():
    d = euclidean_distance(-72.1235, 42.3521, -72.1260, 42.45)
    assert float(d) == pytest.approx(0.09793191512474639, rel=1e-12)


def test_haversine_destination_roundtrip():
    # haversine.rs destination doctest
    lon, lat = haversine_destination(9.177789688110352, 48.776781529534965, 45.0, 10000.0)
    assert float(lon) == pytest.approx(9.274409949623532, rel=1e-9)
    assert float(lat) == pytest.approx(48.84033274015048, rel=1e-9)


def test_bearing_range():
    b = haversine_bearing(NYC[0], NYC[1], LONDON[0], LONDON[1])
    assert 0.0 <= float(b) < 360.0


def test_cross_track_on_path_is_zero():
    d = cross_track_distance(0.5, 0.0, 0.0, 0.0, 1.0, 0.0)
    assert abs(float(d)) < 1e-6


def test_vectorized_batch():
    lons = np.linspace(-170, 170, 1000)
    lats = np.linspace(-80, 80, 1000)
    d = haversine_distance(lons, lats, lons + 1.0, lats)
    assert d.shape == (1000,)
    assert (d > 0).all()
    v = vincenty_distance(lons, lats, lons + 1.0, lats)
    assert np.isfinite(v).all()
    # vincenty and haversine agree to ~0.5%
    assert np.allclose(v, d, rtol=7e-3)


def test_haversine_closest_point_reference_golden():
    # haversine_closest_point.rs doctest (eps 1e-6)
    from geo_spark.kernels.measures import haversine_closest_point_segment

    lon, lat = haversine_closest_point_segment(
        -84.75625, 31.81056, -85.93942, 32.11055, -84.74905, 32.61454
    )
    assert abs(lon - -85.13337428852164) < 1e-6
    assert abs(lat - 32.45365659858937) < 1e-6


def test_haversine_closest_point_clamps_to_endpoints():
    from geo_spark.kernels.measures import (
        haversine_closest_point_linestring,
        haversine_closest_point_segment,
    )

    # P beyond A along the arc → A
    assert haversine_closest_point_segment(-10.0, 0.0, 0.0, 0.0, 10.0, 0.0) == (0.0, 0.0)
    # high-latitude long segment: planar projection would drift; the true
    # closest point to the pole-side P lies mid-arc (lat > endpoints)
    lon, lat = haversine_closest_point_segment(45.0, 89.0, 0.0, 60.0, 90.0, 60.0)
    assert lat > 65.0 and abs(lon - 45.0) < 1e-9
    c = haversine_closest_point_linestring(45.0, 89.0, [(0, 60), (90, 60), (90, 0)])
    assert c[1] > 65.0
