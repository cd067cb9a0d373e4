"""spark-submit entry point for the flagship PIP pipeline.

Run (local master or a standalone cluster):

    zip -r /tmp/geo_spark_pkg.zip geo_spark
    $SPARK_HOME/bin/spark-submit \
        --master spark://127.0.0.1:7077 \
        --py-files /tmp/geo_spark_pkg.zip \
        --conf spark.executor.cores=2 --conf spark.cores.max=8 \
        tools/submit_flagship.py [n_docs] [out_path]

The job synthesizes (or reads) CC-style documents, extracts points, writes
the range-partitioned doc_points table, runs the PIP join against the admin
grid, and prints per-polygon counts — the exact production shape of the
north rule, exercised through the spark-submit packaging path.
"""

import sys

from pyspark.sql import SparkSession, functions as F


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/geo_spark_submit_out"

    spark = SparkSession.builder.appName("geo_spark_flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from geo_spark.operators.extract import extract_points
    from geo_spark.operators.pip_join import pip_join_points_polygons
    from geo_spark.sources.documents import synth_admin_polygons, synth_documents
    from geo_spark.sources.io import write_doc_points

    docs = synth_documents(spark, n_docs)
    pts = extract_points(docs)
    write_doc_points(pts, f"{out}/doc_points.parquet")
    pts2 = spark.read.parquet(f"{out}/doc_points.parquet")
    polys = synth_admin_polygons(spark, grid_deg=10.0, with_holes=True)
    joined = pip_join_points_polygons(pts2, polys, predicate="contains")
    counts = joined.groupBy("polygon_id").agg(F.count("*").alias("n"))
    counts.write.mode("overwrite").parquet(f"{out}/pip_counts.parquet")
    total = counts.agg(F.sum("n")).collect()[0][0]
    print(f"FLAGSHIP_OK n_docs={n_docs} joined={total}")
    spark.stop()


if __name__ == "__main__":
    main()
