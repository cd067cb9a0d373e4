"""Projections (kernels/project.py — the proj.rs analogue): UTM Krüger
series validated against the engine's own Karney geodesic meridian arc,
Web Mercator closed forms, and the Spark column surface."""

import numpy as np
from pyspark.sql import functions as F


def test_utm_roundtrip_submicrometer():
    from geo_spark.kernels.project import utm_forward, utm_inverse

    rng = np.random.RandomState(3)
    lon = rng.uniform(-179, 179, 4000)
    lat = rng.uniform(-84, 84, 4000)
    e, n, z, s = utm_forward(lon, lat)
    lon2, lat2 = utm_inverse(e, n, z, s)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10


def test_utm_central_meridian_against_karney_arc():
    # northing on the central meridian must equal k0 × the meridian arc
    # length, which the (independent) Karney geodesic kernel computes
    from geo_spark.kernels.geodesic import geodesic_inverse_batch
    from geo_spark.kernels.project import utm_forward

    lats = np.array([5.0, 27.5, 45.0, 63.25, 80.0, -33.0])
    lon0 = -75.0  # zone 18
    e, n, z, s = utm_forward(np.full(6, lon0), lats, zone=np.full(6, 18))
    assert np.abs(e - 500000.0).max() == 0.0
    arc = geodesic_inverse_batch(
        np.zeros(6), np.full(6, lon0), np.abs(lats), np.full(6, lon0)
    )[0]
    nmer = np.where(s, n - 10000000.0, n)
    assert np.abs(np.abs(nmer) - 0.9996 * arc).max() < 1e-6  # sub-µm


def test_web_mercator_goldens():
    from geo_spark.kernels.project import web_mercator_forward, web_mercator_inverse

    x, y = web_mercator_forward(np.array([180.0, 0.0]), np.array([0.0, 0.0]))
    assert x[0] == 20037508.342789244 and x[1] == 0.0 and y[1] == 0.0
    lon, lat = web_mercator_inverse(*web_mercator_forward(
        np.array([2.2945]), np.array([48.8584])
    ))
    assert abs(lon[0] - 2.2945) < 1e-12 and abs(lat[0] - 48.8584) < 1e-12


def test_projection_column_surface(spark):
    from geo_spark.functions import utm_zone_col, web_mercator_x, web_mercator_y
    from geo_spark.operators.scalar import utm_project, utm_unproject

    df = spark.createDataFrame(
        [(0, -73.9857, 40.7484), (1, 151.2153, -33.8568), (2, 2.2945, 48.8584)],
        "id long, lon double, lat double",
    )
    u = utm_project(F.col("lon"), F.col("lat"))
    rt = utm_unproject(u["easting"], u["northing"], u["zone"], u["south"])
    rows = {
        r["id"]: r
        for r in df.select(
            "id", u.alias("u"), rt.alias("rt"),
            utm_zone_col("lon").alias("z"),
            web_mercator_x("lon").alias("wx"),
            web_mercator_y("lat").alias("wy"),
        ).collect()
    }
    assert rows[0]["u"]["zone"] == 18 and rows[0]["z"] == 18 and not rows[0]["u"]["south"]
    assert rows[1]["u"]["zone"] == 56 and rows[1]["u"]["south"]
    assert rows[2]["u"]["zone"] == 31
    for i in rows:
        assert abs(rows[i]["rt"]["lon"] - df.collect()[i]["lon"]) < 1e-9
    # web mercator pure-SQL column matches the numpy kernel
    from geo_spark.kernels.project import web_mercator_forward
    wx, wy = web_mercator_forward(np.array([-73.9857]), np.array([40.7484]))
    assert abs(rows[0]["wx"] - wx[0]) < 1e-6 and abs(rows[0]["wy"] - wy[0]) < 1e-6
