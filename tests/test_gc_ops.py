"""Tagged-GeometryCollection column ops: dimension-phase centroid
(centroid.rs:36 / JTS Centroid fallback chain), validity, dimension."""

import numpy as np
from pyspark.sql import functions as F


def _gc_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, gc array<struct<kind:string, rings:array<array<struct<x:double,y:double>>>>>",
    )


def _m(kind, *rings):
    return {"kind": kind, "rings": [[{"x": float(x), "y": float(y)} for x, y in r] for r in rings]}


def test_gc_centroid_phase_fallback(spark):
    from geo_spark.operators.gc import gc_centroid, gc_dimension

    sq = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    flat = [(0, 0), (4, 0), (0, 0)]  # zero-area polygon → line phase
    rows = [
        # area phase: square dominates the line and point members
        (0, [_m("polygon", sq), _m("linestring", [(10, 10), (11, 10)]), _m("point", [(5, 5)])]),
        # line phase: zero-area polygon ring weighs in as length
        (1, [_m("polygon", flat), _m("point", [(9, 9)])]),
        # point phase: only points and a zero-length line (its first point counts)
        (2, [_m("point", [(1, 1)]), _m("point", [(3, 5)]), _m("linestring", [(5, 9), (5, 9)])]),
        # empty collection → null centroid
        (3, []),
    ]
    df = _gc_df(spark, rows)
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            gc_centroid(F.col("gc")).alias("c"),
            gc_dimension(F.col("gc")).alias("dim"),
        ).collect()
    }
    assert (out[0]["c"]["x"], out[0]["c"]["y"]) == (1.0, 1.0) and out[0]["dim"] == 2
    # flat ring: segments (0,0)->(4,0)->(0,0), length-weighted centroid (2,0)
    assert (out[1]["c"]["x"], out[1]["c"]["y"]) == (2.0, 0.0) and out[1]["dim"] == 2
    assert (out[2]["c"]["x"], out[2]["c"]["y"]) == (3.0, 5.0) and out[2]["dim"] == 1
    assert out[3]["c"] is None and out[3]["dim"] == -1


def test_gc_is_valid(spark):
    from geo_spark.operators.gc import gc_is_valid

    sq = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    bowtie = [(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)]
    rows = [
        (0, [_m("polygon", sq), _m("point", [(1, 1)])]),
        (1, [_m("polygon", bowtie)]),
        (2, [_m("linestring", [(0, 0), (0, 0)])]),  # degenerate line
        (3, [_m("linestring", [(0, 0), (1, 1)])]),
    ]
    out = {
        r["id"]: r["ok"]
        for r in _gc_df(spark, rows)
        .select("id", gc_is_valid(F.col("gc")).alias("ok"))
        .collect()
    }
    assert out[0] is True and out[1] is False and out[2] is False and out[3] is True


def test_gc_centroid_matches_corpus_kernel():
    # the column op and the conformance-certified kernel are the same code
    from geo_spark.kernels.area import centroid_phases

    got = centroid_phases(
        [(0.0, 0.0)],
        [np.array([(0.0, 0.0), (2.0, 0.0)])],
        [(np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype=float), [])],
    )
    assert got == (0.5, 0.5)
