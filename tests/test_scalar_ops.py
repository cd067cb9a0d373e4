"""Column-level scalar geometry operators: Spark output == numpy kernels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.operators import scalar

L_SHAPE = [(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0), (1.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
ZIGZAG = [(0.0, 0.0), (5.0, 4.0), (11.0, 5.5), (17.3, 3.2), (27.8, 0.1)]


def _coords_df(spark):
    rows = [
        (0, [{"x": x, "y": y} for x, y in L_SHAPE]),
        (1, [{"x": x, "y": y} for x, y in ZIGZAG]),
    ]
    return spark.createDataFrame(
        rows, schema="gid long, coords array<struct<x:double,y:double>>"
    )


def _np(arr):
    return np.asarray([(c["x"], c["y"]) for c in arr])


def test_simplify_rdp_column(spark):
    df = _coords_df(spark).withColumn("simp", scalar.simplify_rdp(F.col("coords"), 1.0))
    got = {r["gid"]: _np(r["simp"]) for r in df.collect()}
    assert np.array_equal(
        got[1], np.asarray([(0, 0), (5, 4), (11, 5.5), (27.8, 0.1)], dtype=np.float64)
    )


def test_area_bbox_centroid_sql(spark):
    df = _coords_df(spark).select(
        "gid",
        scalar.ring_area_sql(F.col("coords")).alias("area"),
        scalar.bounding_rect_sql(F.col("coords")).alias("bbox"),
        scalar.centroid(F.col("coords")).alias("c"),
    )
    r = {x["gid"]: x for x in df.collect()}
    assert r[0]["area"] == 7.0  # L-shape area
    assert (r[0]["bbox"]["xmin"], r[0]["bbox"]["ymax"]) == (0.0, 4.0)
    from geo_spark.kernels.area import polygon_centroid

    exp = polygon_centroid(np.asarray(L_SHAPE))
    assert r[0]["c"]["x"] == pytest.approx(exp[0])
    assert r[0]["c"]["y"] == pytest.approx(exp[1])


def test_affine_sql(spark):
    from geo_spark.kernels import affine

    m = affine.compose(affine.translate(10, 0), affine.rotate(90))
    df = _coords_df(spark).select(
        "gid", scalar.affine_transform_sql(F.col("coords"), m).alias("t"), "coords"
    )
    r = df.filter("gid = 0").collect()[0]
    exp = affine.apply(m, np.asarray(L_SHAPE))
    assert np.allclose(_np(r["t"]), exp, atol=1e-12)


def test_interpolate_locate_substring(spark):
    line = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    df = spark.createDataFrame(
        [(0, [{"x": x, "y": y} for x, y in line])],
        schema="gid long, coords array<struct<x:double,y:double>>",
    )
    out = df.select(
        scalar.interpolate_point(F.col("coords"), 0.25).alias("p"),
        scalar.locate_point(F.col("coords"), 10.0, 5.0).alias("frac"),
        scalar.substring_line(F.col("coords"), 0.25, 0.75).alias("sub"),
    ).collect()[0]
    assert (out["p"]["x"], out["p"]["y"]) == (5.0, 0.0)
    assert out["frac"] == pytest.approx(0.75)
    assert np.array_equal(_np(out["sub"]), np.asarray([(5, 0), (10, 0), (10, 5)]))


def test_frechet_hausdorff_columns(spark):
    a = [{"x": 0.0, "y": 0.0}, {"x": 100.0, "y": 0.0}]
    b = [{"x": 0.0, "y": 50.0}, {"x": 100.0, "y": 50.0}]
    df = spark.createDataFrame(
        [(a, b)],
        schema="a array<struct<x:double,y:double>>, b array<struct<x:double,y:double>>",
    )
    r = df.select(
        scalar.frechet(F.col("a"), F.col("b")).alias("f"),
        scalar.hausdorff(F.col("a"), F.col("b")).alias("h"),
    ).collect()[0]
    assert r["f"] == 50.0
    assert r["h"] == 50.0


def test_remove_repeated_and_convex(spark):
    dup = [{"x": 0.0, "y": 0.0}, {"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 1.0}]
    df = spark.createDataFrame(
        [(dup,)], schema="coords array<struct<x:double,y:double>>"
    )
    r = df.select(
        scalar.remove_repeated(F.col("coords")).alias("d"),
        scalar.is_convex(F.col("coords")).alias("cv"),
    ).collect()[0]
    assert len(r["d"]) == 2
    assert r["cv"]  # degenerate/short → convex True


def test_radians_degrees_roundtrip(spark):
    df = _coords_df(spark).select(
        "coords",
        scalar.coords_to_degrees_sql(
            scalar.coords_to_radians_sql(F.col("coords"))
        ).alias("rt"),
    )
    r = df.collect()[0]
    assert np.allclose(_np(r["rt"]), _np(r["coords"]), atol=1e-12)
