"""Karney geodesic parity — the reference's own doctest goldens
(geodesic.rs, geodesic_area.rs) plus the antipodal region where Vincenty's
iteration diverges by construction (vincenty_distance.rs:13).
"""

import math

import numpy as np
import pytest

from geo_spark.kernels.geodesic import (
    WGS84,
    geodesic_area_signed,
    geodesic_area_unsigned,
    geodesic_direct,
    geodesic_inverse,
    geodesic_perimeter,
)


def test_distance_sofia_plovdiv_golden():
    # geodesic.rs doctest: 132675.5018588206 m
    s, _, _ = geodesic_inverse(42.698334, 23.319941, 42.136097, 24.742168)
    assert s == pytest.approx(132675.5018588206, rel=1e-12)


def test_bearing_golden():
    # geodesic.rs doctest: bearing (9,10)->(9.5,10.1) ≈ 78.54 (eps 1e-2)
    _, azi1, _ = geodesic_inverse(10.0, 9.0, 10.1, 9.5)
    assert (azi1 + 360.0) % 360.0 == pytest.approx(78.54, abs=1e-2)


def test_destination_jfk_golden():
    # geodesic.rs doctest: 100 km NE of JFK ≈ (-72.94, 41.27) (eps 1e-2)
    lat2, lon2, _ = geodesic_direct(40.64, -73.78, 45.0, 100_000.0)
    assert lon2 == pytest.approx(-72.94, abs=1e-2)
    assert lat2 == pytest.approx(41.27, abs=1e-2)


def test_meridian_quarter():
    # WGS84 meridian quarter: 10001965.7293 m (public constant)
    s, azi1, _ = geodesic_inverse(0, 0, 90, 0)
    assert s == pytest.approx(10001965.7293127, abs=1e-5)
    assert azi1 == pytest.approx(0.0, abs=1e-12)


def test_antipodal_cases_where_vincenty_fails():
    # exactly antipodal equator points: path over the pole = 2 quarters
    s, _, _ = geodesic_inverse(0, 0, 0, 180)
    assert s == pytest.approx(2 * 10001965.7293127, abs=1e-4)
    # geographiclib's documented inverse example: (0,0) -> (0.5,179.5)
    s, azi1, _ = geodesic_inverse(0.0, 0.0, 0.5, 179.5)
    assert s == pytest.approx(19936288.579, abs=0.01)
    assert azi1 == pytest.approx(25.67, abs=0.01)
    # near-antipodal generic
    s, _, _ = geodesic_inverse(30, 0, -30.0001, 179.99)
    assert 19_900_000 < s < 20_004_000


def test_equatorial_cut():
    # along the equator while lam12 <= (1-f)*pi, off it beyond
    s, azi1, _ = geodesic_inverse(0, 0, 0, 90)
    assert s == pytest.approx(math.radians(90) * 6378137.0, rel=1e-12)
    assert azi1 == pytest.approx(90.0, abs=1e-9)
    s2, azi2, _ = geodesic_inverse(0, 0, 0, 179.6)  # beyond the cut
    assert azi2 != pytest.approx(90.0, abs=1.0)  # leaves the equator


def test_direct_inverse_roundtrip():
    rng = np.random.RandomState(11)
    for _ in range(40):
        lat1, lon1 = rng.uniform(-89, 89), rng.uniform(-180, 180)
        lat2, lon2 = rng.uniform(-89, 89), rng.uniform(-180, 180)
        s, azi1, _ = geodesic_inverse(lat1, lon1, lat2, lon2)
        glat, glon, _ = geodesic_direct(lat1, lon1, azi1, s)
        assert abs(glat - lat2) < 1e-9
        assert abs(((glon - lon2 + 180) % 360) - 180) < 1e-9


def test_area_australia_golden():
    # geodesic_area.rs test: ±7786102826806.07 m² by winding
    lons = [125.0, 113.0, 117.0, 130.0, 148.0, 154.0, 144.0]
    lats = [-15.0, -22.0, -37.0, -33.0, -39.0, -27.0, -15.0]
    assert geodesic_area_signed(lons, lats) == pytest.approx(
        7786102826806.07, abs=0.5
    )
    assert geodesic_area_signed(lons[::-1], lats[::-1]) == pytest.approx(
        -7786102826806.07, abs=0.5
    )


def test_area_unsigned_cw_square_golden():
    # geodesic_area.rs doctest: CW 1°-square → rest of the earth
    u = geodesic_area_unsigned([0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0])
    assert u == pytest.approx(510053312945726.94, abs=1.0)


def test_area_london_golden():
    lons = [0.00388383, 0.00538587, 0.00553607, 0.00467777, 0.00327229,
            0.00187754, 0.00087976, 0.00107288, 0.00185608]
    lats = [51.501574, 51.502278, 51.503299, 51.504181, 51.504435,
            51.504168, 51.503380, 51.502324, 51.501770]
    assert round(geodesic_area_unsigned(lons, lats)) == 78_596


def test_area_perimeter_with_holes_golden():
    # geodesic_area.rs test_holes. The quadrature value is converged to
    # machine precision (stable under node/panel refinement); the golden
    # itself carries a few m² of planimeter accumulation noise at this
    # scale, hence rel=1e-11 rather than the raw ±0.01.
    ext = ([0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0])
    h1 = ([1.0, 1.0, 2.0, 2.0], [1.0, 2.0, 2.0, 1.0])  # CW → negative
    h2 = ([5.0, 5.0, 6.0, 6.0], [5.0, 6.0, 6.0, 5.0])
    area = sum(geodesic_area_signed(*r) for r in (ext, h1, h2))
    per = sum(geodesic_perimeter(*r) for r in (ext, h1, h2))
    assert area == pytest.approx(1203317999173.7063, rel=1e-11)
    assert per == pytest.approx(5307742.446635911, abs=1e-4)


def test_total_area_is_earth_surface():
    assert WGS84.total_area() == pytest.approx(5.10065621724e14, rel=1e-11)


def test_geodesic_columns(spark):
    from geo_spark.operators.geodesic_ops import (
        geodesic_bearing_deg,
        geodesic_destination,
        geodesic_meters,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(23.319941, 42.698334), (0.0, 0.0)], "lon double, lat double"
    )
    got = df.select(
        geodesic_meters("lon", "lat", F.lit(24.742168), F.lit(42.136097)).alias("d"),
        geodesic_bearing_deg("lon", "lat", F.lit(24.742168), F.lit(42.136097)).alias("b"),
        geodesic_destination("lon", "lat", F.lit(45.0), F.lit(100000.0)).alias("dest"),
    ).collect()
    assert got[0]["d"] == pytest.approx(132675.5018588206, rel=1e-12)
    exp_s, exp_azi, _ = geodesic_inverse(0.0, 0.0, 42.136097, 24.742168)
    assert got[1]["d"] == pytest.approx(exp_s, rel=1e-12)
    lat2, lon2, _ = geodesic_direct(42.698334, 23.319941, 45.0, 100000.0)
    assert got[0]["dest"]["lon"] == pytest.approx(lon2, abs=1e-12)
    assert got[0]["dest"]["lat"] == pytest.approx(lat2, abs=1e-12)


def test_interpolate_point_goldens():
    # geodesic.rs InterpolatePoint doctests (eps 1e-2)
    from geo_spark.kernels.geodesic import (
        geodesic_point_at_distance,
        geodesic_point_at_ratio,
    )

    lon, lat = geodesic_point_at_distance(20, 10, 25, 125, 100_000.0)
    assert (lon, lat) == pytest.approx((10.81, 20.49), abs=1e-2)
    lon, lat = geodesic_point_at_distance(20, 10, 25, 125, 10_000_000.0)
    assert (lon, lat) == pytest.approx((112.20, 30.67), abs=1e-2)
    lon, lat = geodesic_point_at_ratio(20, 10, 25, 125, 0.5)
    assert (lon, lat) == pytest.approx((65.88, 37.72), abs=1e-2)
    lon, lat = geodesic_point_at_ratio(20, 10, 25, 125, 0.1)
    assert (lon, lat) == pytest.approx((19.52, 25.31), abs=1e-2)
    lon, lat = geodesic_point_at_ratio(20, 10, 25, 125, 0.9)
    assert (lon, lat) == pytest.approx((114.73, 29.69), abs=1e-2)


def test_batch_solvers_match_scalar():
    import numpy as np

    from geo_spark.kernels.geodesic import (
        WGS84,
        geodesic_direct_batch,
        geodesic_inverse_batch,
    )

    rng = np.random.RandomState(7)
    lat1 = rng.uniform(-89.9, 89.9, 400)
    lon1 = rng.uniform(-180, 180, 400)
    lat2 = rng.uniform(-89.9, 89.9, 400)
    lon2 = rng.uniform(-180, 180, 400)
    special = [
        (-30.0, 10.0, 30.0, -170.0),   # near-antipodal
        (0.0, 0.0, 0.0, 179.7),        # antipodal equatorial
        (10.0, 20.0, 10.0, 20.0),      # coincident
        (0.0, 0.0, 0.0, 90.0),         # equatorial
        (10.0, 5.0, -40.0, 5.0),       # meridional
        (90.0, 0.0, -90.0, 0.0),       # pole to pole
        (90.0, 10.0, 45.0, 10.0),      # from the pole
        (0.0, -180.0, 0.0, 180.0),     # dateline
    ]
    for t in special:
        lat1 = np.append(lat1, t[0]); lon1 = np.append(lon1, t[1])
        lat2 = np.append(lat2, t[2]); lon2 = np.append(lon2, t[3])
    s, a1, a2 = geodesic_inverse_batch(lat1, lon1, lat2, lon2)
    for i in range(len(lat1)):
        ss, sa1, sa2 = WGS84.inverse(lat1[i], lon1[i], lat2[i], lon2[i])
        assert abs(ss - s[i]) < 1e-6 + 1e-12 * abs(ss)
        assert abs(sa1 - a1[i]) < 1e-6 and abs(sa2 - a2[i]) < 1e-6

    azi = rng.uniform(-180, 180, len(lat1))
    dist = rng.uniform(0, 19_000_000, len(lat1))
    blat, blon, bazi = geodesic_direct_batch(lat1, lon1, azi, dist)
    for i in range(len(lat1)):
        sl, so, sz = WGS84.direct(lat1[i], lon1[i], azi[i], dist[i])
        assert abs(sl - blat[i]) < 1e-9 and abs(so - blon[i]) < 1e-9
        assert abs(sz - bazi[i]) < 1e-9


def test_direct_from_pole_descends_correct_meridian():
    # at the north pole the geodesic with azimuth a descends the
    # lon1 + 180 - a meridian (geographiclib convention); the exact
    # (sin s1, cos s1) pair keeps the azimuth from collapsing to noise
    import numpy as np

    from geo_spark.kernels.geodesic import WGS84, geodesic_direct_batch

    lat, lon, _ = WGS84.direct(90.0, 0.0, 30.0, 3_000_000.0)
    assert abs(lon - 150.0) < 1e-9
    lat_b, lon_b, _ = geodesic_direct_batch([90.0], [0.0], [30.0], [3_000_000.0])
    assert abs(lon_b[0] - 150.0) < 1e-9
    assert abs(lat_b[0] - lat) < 1e-12


def test_inverse_direct_roundtrip_batch():
    # direct(p1, inverse(p1, p2)) == p2 — the invariant the driver oracle
    # checks for geodesic_roundtrip
    import numpy as np

    from geo_spark.kernels.geodesic import geodesic_direct_batch, geodesic_inverse_batch

    rng = np.random.RandomState(3)
    lat1 = rng.uniform(-80, 80, 300); lon1 = rng.uniform(-180, 180, 300)
    lat2 = rng.uniform(-80, 80, 300); lon2 = rng.uniform(-180, 180, 300)
    s, a1, _ = geodesic_inverse_batch(lat1, lon1, lat2, lon2)
    rlat, rlon, _ = geodesic_direct_batch(lat1, lon1, a1, s)
    assert np.max(np.abs(rlat - lat2)) < 1e-9
    dlon = np.minimum(np.abs(rlon - lon2), 360 - np.abs(rlon - lon2))
    assert np.max(dlon * np.cos(np.radians(lat2))) < 1e-9


def test_rings_area_perimeter_batch_matches_scalar():
    import numpy as np

    from geo_spark.kernels.geodesic import WGS84

    rng = np.random.RandomState(9)
    rings = []
    for i in range(25):
        n = 4 + i % 6
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        r = 1.0 + 0.3 * rng.rand(n)
        ring = np.column_stack([cx + r * np.cos(ang), cy + 0.5 * r * np.sin(ang)])
        rings.append(np.vstack([ring, ring[:1]]))
    rings.append(np.column_stack([np.linspace(-180, 180, 13), np.full(13, 80.0)]))
    rings.append(np.array([(0.0, 0.0), (1.0, 1.0)]))  # degenerate -> 0
    areas, perims = WGS84.rings_area_perimeter_batch(rings)
    for i, ring in enumerate(rings):
        a, p = WGS84.polygon_area_perimeter(ring[:, 0], ring[:, 1])
        assert abs(a - areas[i]) <= 1e-4 + 1e-10 * abs(a)
        assert abs(p - perims[i]) <= 1e-6 + 1e-12 * abs(p)


def test_geodesic_intermediate_reference_doctest():
    # geodesic_intermediate.rs doctest goldens (1e-6)
    import numpy as np
    from geo_spark.kernels.geodesic import geodesic_intermediate

    for f, exp in [
        (0.2, (29.842907, 29.951445)),
        (0.5, (65.879360, 37.722253)),
        (0.8, (103.556796, 33.506196)),
    ]:
        lon, lat = geodesic_intermediate([10.0], [20.0], [125.0], [25.0], f)
        assert abs(lon[0] - exp[0]) < 1e-6 and abs(lat[0] - exp[1]) < 1e-6
