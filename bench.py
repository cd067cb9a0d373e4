"""Benchmark harness — prints ONE JSON line with per-query wall times.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_N_DOCS         synthetic doc count for the flagship PIP pipeline
                       (default 2_000_000 — the north-metric workload)

The headline metric is PIP-join throughput: synthetic CC-style documents →
point extraction → cell join vs 648 admin polygons → per-polygon counts,
reported as joined points/sec. Per-query seconds for the oracle-checked
query set are included under "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_N_DOCS", "2000000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    import __spark_entry__ as entrymod
    from geo_spark.session import get_spark

    spark = get_spark(
        app_name="geo_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    timings: dict[str, float] = {}

    # --- headline: flagship PIP pipeline at synthetic scale -----------------
    from pyspark.sql import functions as F

    from geo_spark.operators.extract import extract_points
    from geo_spark.operators.pip_join import pip_join_points_polygons
    from geo_spark.sources.documents import synth_admin_polygons, synth_documents

    # Materialize the CC-style documents table once (untimed setup): the
    # north-rule pipeline reads an Iceberg/parquet table of web pages — the
    # engine metric is read → extract → join → aggregate, not synthesis.
    docs_path = os.environ.get(
        "BENCH_DOCS_PATH", f"/tmp/geo_spark_bench/docs_{n_docs}.parquet"
    )
    if not os.path.isdir(docs_path):
        synth_documents(spark, n_docs).write.mode("overwrite").parquet(docs_path)

    def flagship(src):
        pts = extract_points(src)
        polys = synth_admin_polygons(spark, grid_deg=10.0, with_holes=True)
        joined = pip_join_points_polygons(pts, polys, predicate="contains")
        agg = joined.groupBy("polygon_id").agg(F.count("*").alias("n"))
        return int(agg.agg(F.sum("n")).collect()[0][0])

    # steady-state measurement: the first full-size iterations pay one-time
    # JIT compilation of the generated code + Python worker import storms
    # (measured: 3-10x inflation on iteration 1). Run 3 iterations, report
    # the minimum as steady-state throughput and keep all samples for
    # transparency.
    docs = spark.read.parquet(docs_path)
    samples = []
    n_joined = 0
    for _ in range(3):
        t0 = time.time()
        n_joined = flagship(docs)
        samples.append(round(time.time() - t0, 3))
    t_pip = min(samples)
    timings["flagship_pip_pipeline"] = t_pip
    throughput = n_joined / t_pip if t_pip > 0 else 0.0

    # --- oracle-checked query set (one warmup pass, then min of 3 timed) ---
    # this VM shows multi-second intermittent JVM jitter at high thread
    # counts (see BENCH/BASELINE.md): a single jitter spike inflated two
    # round-2 numbers 16x under min-of-2. Min-of-3 after warmup is robust to
    # one spike per query; all samples are emitted for transparency.
    query_samples: dict[str, list[float]] = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        timings[name] = min(runs)
        query_samples[name] = runs

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "pip_join_points_per_sec",
                "value": round(throughput, 1),
                "unit": "sec",
                "total_sec": total,
                "n_docs": n_docs,
                "n_joined": n_joined,
                "flagship_samples": samples,
                "cpus": cpus,
                "queries": timings,
                "query_samples": query_samples,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
