"""Stage isolation for the PIP family (guide §1.4 noop-sink methodology).

Times each phase of pip_contains_grid10 and the flagship separately so the
fixed driver-side setup (count/collect/cover/createDataFrame/broadcast) is
visible next to the distributed work. Not part of the graded bench.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geo_spark.session import get_spark


def t(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile_pip", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    import __spark_entry__ as e
    from geo_spark.operators.extract import extract_points
    from geo_spark.operators.pip_join import (
        _driver_cover_rows, choose_res, pip_join_points_polygons)
    from geo_spark.sources.documents import synth_admin_polygons
    from geo_spark.functions import bbox_contains_point, cell_encode_col

    # ---- pip_contains_grid10 on sf data ----
    pts = e._derived_points(spark, sf_dir)
    noop(pts)  # warm
    t("derived_points -> noop", lambda: noop(e._derived_points(spark, sf_dir)))

    def poly_setup():
        polys = synth_admin_polygons(spark, grid_deg=10.0, with_holes=False)
        n = polys.count()
        rows = polys.select("polygon_id", "exterior", "interiors",
                            "xmin", "ymin", "xmax", "ymax").collect()
        res = choose_res(rows)
        cov = _driver_cover_rows(rows, res)
        return n, res, len(cov)

    n, res, ncov = poly_setup()
    print(f"          polys n={n} res={res} cover_rows={ncov}")
    t("poly count+collect+cover (driver)", poly_setup)

    def build_polys():
        return synth_admin_polygons(spark, grid_deg=10.0, with_holes=False)

    def q_full(refine):
        joined = pip_join_points_polygons(
            e._derived_points(spark, sf_dir), build_polys(),
            predicate="contains", refine=refine)
        noop(joined.groupBy("polygon_id").agg(F.count("*").alias("n")))

    # candidates without refine
    def q_cand():
        polys = build_polys()
        rows = polys.select("polygon_id", "exterior", "interiors",
                            "xmin", "ymin", "xmax", "ymax").collect()
        res_ = choose_res(rows)
        cov = _driver_cover_rows(rows, res_)
        cover_df = spark.createDataFrame(
            cov, schema="cell long, polygon_id long, full boolean, "
            "xmin double, ymin double, xmax double, ymax double")
        p = e._derived_points(spark, sf_dir).withColumn(
            "_cell", cell_encode_col("lon", "lat", res_))
        cand = p.join(F.broadcast(cover_df), p["_cell"] == cover_df["cell"])
        cand = cand.filter(bbox_contains_point("xmin", "ymin", "xmax", "ymax", "lon", "lat"))
        noop(cand.groupBy("polygon_id").agg(F.count("*")))

    q_full("pandas")
    t("pip_grid10 full (pandas refine)", lambda: q_full("pandas"))
    t("pip_grid10 candidates only (no refine)", q_cand)
    q_full("sql")
    t("pip_grid10 full (sql refine)", lambda: q_full("sql"))

    # parity check pandas vs sql on this data
    a = pip_join_points_polygons(
        e._derived_points(spark, sf_dir), build_polys(), predicate="contains",
        refine="pandas").groupBy("polygon_id").agg(F.count("*").alias("n"))
    b = pip_join_points_polygons(
        e._derived_points(spark, sf_dir), build_polys(), predicate="contains",
        refine="sql").groupBy("polygon_id").agg(F.count("*").alias("n"))
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"          pandas-vs-sql diff rows: {diff}")

    # ---- flagship stages at 2M docs ----
    docs_path = "/tmp/geo_spark_bench/docs_2000000.parquet"
    if os.path.isdir(docs_path):
        docs = spark.read.parquet(docs_path)
        noop(docs.select("url", "text"))
        t("flagship: docs scan url+text", lambda: noop(docs.select("url", "text")))
        t("flagship: extract_points", lambda: noop(extract_points(docs)))

        def flag(refine):
            pts_ = extract_points(docs)
            polys_ = synth_admin_polygons(spark, grid_deg=10.0, with_holes=True)
            joined = pip_join_points_polygons(pts_, polys_, predicate="contains",
                                              refine=refine)
            agg = joined.groupBy("polygon_id").agg(F.count("*").alias("n"))
            return int(agg.agg(F.sum("n")).collect()[0][0])

        print("          flagship n_joined pandas:", flag("pandas"))
        t("flagship full (pandas refine)", lambda: flag("pandas"))
        print("          flagship n_joined sql:   ", flag("sql"))
        t("flagship full (sql refine)", lambda: flag("sql"))
    spark.stop()


if __name__ == "__main__":
    main()
