"""Column surface for batch-2 construction kernels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.operators.geometry2 import (
    buffer_ring,
    concave_hull_points,
    interior_point_col,
    triangulate,
    validity_problems,
    voronoi_of_group,
)

SQ = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
BOWTIE = [(0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)]


def _coords(pairs):
    return [{"x": x, "y": y} for x, y in pairs]


def test_geometry2_columns(spark):
    df = spark.createDataFrame(
        [(1, _coords(SQ), []), (2, _coords(BOWTIE), [])],
        schema="gid long, exterior array<struct<x:double,y:double>>, "
        "interiors array<array<struct<x:double,y:double>>>",
    )
    out = df.select(
        "gid",
        buffer_ring(F.col("exterior"), 1.0).alias("buf"),
        triangulate(F.col("exterior")).alias("tris"),
        validity_problems(F.col("exterior"), F.col("interiors")).alias("problems"),
        interior_point_col(F.col("exterior"), F.col("interiors")).alias("ip"),
    ).collect()
    r = {x["gid"]: x for x in out}
    assert len(r[1]["buf"]) == 1  # dilated square
    assert len(r[1]["tris"]) == 2  # square → 2 triangles
    assert r[1]["problems"] == []
    assert any("self-intersection" in p for p in r[2]["problems"])
    assert 0 < r[1]["ip"]["x"] < 10 and 0 < r[1]["ip"]["y"] < 10


def test_concave_hull_column(spark):
    rng = np.random.RandomState(2)
    pts = rng.uniform(0, 10, (80, 2))
    df = spark.createDataFrame(
        [(1, [{"x": float(x), "y": float(y)} for x, y in pts])],
        schema="gid long, pts array<struct<x:double,y:double>>",
    )
    out = df.select(concave_hull_points(F.col("pts"), 2.0).alias("hull")).collect()[0]
    assert len(out["hull"]) >= 4
    assert out["hull"][0] == out["hull"][-1]


def test_voronoi_group_operator(spark):
    rng = np.random.RandomState(3)
    rows = []
    for g in (1, 2):
        for x, y in rng.uniform(0, 50, (12, 2)):
            rows.append((g, float(x), float(y)))
    df = spark.createDataFrame(rows, schema="group_id long, lon double, lat double")
    out = voronoi_of_group(df)
    got = out.collect()
    assert len(got) == 24
    from geo_spark.kernels.predicates import ring_position

    for r in got[:6]:
        ring = np.asarray([(c["x"], c["y"]) for c in r["cell_ring"]])
        assert ring_position([r["lon"]], [r["lat"]], ring)[0] >= 0


def test_payload_memo_repeated_and_distinct_rows(spark):
    # Round-6: heavy geometry UDFs dedup identical payloads per batch
    # (_PayloadMemo). Repeated and distinct rows must give exactly the
    # per-row kernel results.
    import numpy as np
    from pyspark.sql import functions as F

    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.boolops import unary_union
    from geo_spark.operators.geometry2 import unary_union_rings

    def ring(x0, y0, s):
        return [
            {"x": float(x0), "y": float(y0)},
            {"x": float(x0 + s), "y": float(y0)},
            {"x": float(x0 + s), "y": float(y0 + s)},
            {"x": float(x0), "y": float(y0 + s)},
            {"x": float(x0), "y": float(y0)},
        ]

    rows = []
    for i in range(40):
        k = i % 3  # heavy repetition
        rows.append((i, [ring(0, 0, 3 + k), ring(2, 0, 3)]))
    rows.append((100, [ring(50, 50, 1)]))  # unique payload
    df = spark.createDataFrame(
        rows, "id long, rings array<array<struct<x:double,y:double>>>"
    )
    got = {
        r["id"]: (r["u"]["n_pieces"], r["u"]["area"])
        for r in df.select("id", unary_union_rings(F.col("rings")).alias("u")).collect()
    }
    for rid, rings_row in rows:
        polys = [
            (np.asarray([(c["x"], c["y"]) for c in rr], dtype=np.float64), [])
            for rr in rings_row
        ]
        merged = unary_union(polys)
        area = sum(
            abs(ring_signed_area(np.asarray(ext, dtype=np.float64))) for ext, _ in merged
        )
        assert got[rid][0] == len(merged)
        assert abs(got[rid][1] - area) < 1e-9
