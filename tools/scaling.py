"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

Runs the flagship PIP join (100M extracted points × 648 complex admin
polygons) on a LOCAL STANDALONE CLUSTER — real separate executor JVMs, the
closest single-box analogue of a multi-executor cluster — at N=1 executor
and 4N=4 executors (2 cores each), shipped via ``spark.submit.pyFiles``
exactly as a spark-submit --py-files job would be.

Method notes (also in BENCH/BASELINE.md):
- min over ITERS iterations per level = steady-state (first iterations pay
  one-time JIT/codegen + Python-worker import; this sandbox also shows
  multi-second JVM jitter unrelated to the engine);
- 2-core executors keep total parallelism under this VM's saturation point
  (the pure-numpy kernel itself tops out at ~21 effective cores of this
  32-vCPU box — measured via multiprocessing — so 8→32 cores measures the
  box, not the engine).

Usage:  python tools/scaling.py [--quick]   (requires a running standalone
master at spark://127.0.0.1:7077 with a 32-core worker; start via
/opt/spark/sbin/start-master.sh -h 127.0.0.1 and start-worker.sh)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MASTER = os.environ.get("SPARK_SCALE_MASTER", "spark://127.0.0.1:7077")
POINTS = int(os.environ.get("SPARK_SCALE_POINTS", "100000000"))
ITERS = int(os.environ.get("SPARK_SCALE_ITERS", "4"))
PKG_ZIP = "/tmp/geo_spark_pkg.zip"
PTS_PATH = f"/tmp/geo_spark_bench/doc_points_{POINTS}.parquet"


def complex_polygons():
    """648 deterministic 96-vertex wobbly polygons on the 10-degree grid —
    realistic admin-boundary complexity (cf. nl_zones fixture shapes)."""
    rows = []
    NV = 96
    for iy in range(18):
        for ix in range(36):
            pid = iy * 36 + ix
            cx, cy = -180 + ix * 10 + 5.0, -90 + iy * 10 + 5.0
            ang = np.linspace(0, 2 * np.pi, NV, endpoint=False)
            rng = np.random.RandomState(pid)
            r = 4.0 + 0.8 * np.sin(5 * ang + pid) + 0.3 * rng.rand(NV)
            xs = cx + r * np.cos(ang)
            ys = np.clip(cy + r * np.sin(ang) * 0.5, -89.9, 89.9)
            ring = np.column_stack([xs, ys])
            ring = np.vstack([ring, ring[:1]])
            rows.append(
                {
                    "polygon_id": pid,
                    "name": f"blob{pid}",
                    "exterior": [{"x": float(x), "y": float(y)} for x, y in ring],
                    "interiors": [],
                    "xmin": float(xs.min()),
                    "ymin": float(ys.min()),
                    "xmax": float(xs.max()),
                    "ymax": float(ys.max()),
                }
            )
    return rows


POLY_SCHEMA = (
    "polygon_id long, name string, exterior array<struct<x:double,y:double>>, "
    "interiors array<array<struct<x:double,y:double>>>, "
    "xmin double, ymin double, xmax double, ymax double"
)


def session(total_cores: int, executor_cores: int = 2):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(MASTER)
        .appName(f"geo_spark_scale_{total_cores}")
        .config("spark.executor.cores", str(executor_cores))
        .config("spark.executor.memory", "8g")
        .config("spark.cores.max", str(total_cores))
        .config("spark.submit.pyFiles", PKG_ZIP)
        .config("spark.sql.shuffle.partitions", str(max(total_cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .getOrCreate()
    )


def materialize(spark):
    from pyspark.sql import functions as F  # noqa: F401

    if os.path.isdir(PTS_PATH):
        return
    lon_md = (
        "CASE WHEN doc_id % 4 = 0 THEN 10000000 + (doc_id * 2654435761) % 1000000 "
        "ELSE (doc_id * 2654435761) % 360000000 - 180000000 END"
    )
    lat_md = (
        "CASE WHEN doc_id % 4 = 0 THEN 50000000 + (doc_id * 2246822519) % 1000000 "
        "ELSE (doc_id * 2246822519) % 180000000 - 90000000 END"
    )
    df = spark.range(0, POINTS, 1, 128).withColumnRenamed("id", "doc_id")
    pts = df.selectExpr(
        "doc_id",
        f"CAST(CASE WHEN ({lon_md}) % 10000000 = 0 THEN ({lon_md})+1 ELSE ({lon_md}) END AS DOUBLE)/CAST(1000000 AS DOUBLE) AS lon",
        f"CAST(CASE WHEN ({lat_md}) % 10000000 = 0 THEN ({lat_md})+1 ELSE ({lat_md}) END AS DOUBLE)/CAST(1000000 AS DOUBLE) AS lat",
    )
    pts.write.mode("overwrite").parquet(PTS_PATH)


def run_level(total_cores: int) -> dict:
    from pyspark.sql import functions as F

    from geo_spark.operators.pip_join import pip_join_points_polygons

    spark = session(total_cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    materialize(spark)
    polys = spark.createDataFrame(complex_polygons(), schema=POLY_SCHEMA)
    pts = spark.read.parquet(PTS_PATH)
    samples = []
    n = 0
    for _ in range(ITERS):
        joined = pip_join_points_polygons(pts, polys, predicate="contains")
        t0 = time.time()
        n = (
            joined.groupBy("polygon_id")
            .agg(F.count("*").alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        samples.append(round(time.time() - t0, 2))
    # determinism evidence: full per-polygon result hash must be identical
    # across parallelism levels (SURVEY §5 determinism requirement)
    import hashlib

    joined = pip_join_points_polygons(pts, polys, predicate="contains")
    rows = sorted(
        (r["polygon_id"], r["n"])
        for r in joined.groupBy("polygon_id").agg(F.count("*").alias("n")).collect()
    )
    result_hash = hashlib.sha256(str(rows).encode()).hexdigest()[:16]
    spark.stop()
    best = min(samples)
    return {
        "total_cores": total_cores,
        "samples_sec": samples,
        "best_sec": best,
        "points_per_sec": round(POINTS / best, 1),
        "n_joined": int(n),
        "result_hash": result_hash,
    }


def main():
    if not os.path.exists(PKG_ZIP):
        subprocess.run(
            ["zip", "-qr", PKG_ZIP, "geo_spark"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            check=True,
        )
    lo = run_level(2)   # N   = 1 executor  × 2 cores
    hi = run_level(8)   # 4N  = 4 executors × 2 cores
    eff = (lo["best_sec"] / hi["best_sec"]) / 4.0
    out = {
        "workload": f"PIP contains join: {POINTS} points x 648 complex polygons",
        "mode": "standalone cluster, 2-core executors, spark.submit.pyFiles",
        "N_executors_1": lo,
        "N_executors_4": hi,
        "speedup_1_to_4_executors": round(lo["best_sec"] / hi["best_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "deterministic_across_levels": lo["result_hash"] == hi["result_hash"],
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
