"""Stream-stream interval join: stream==batch parity over the events table
and the geo tile-region dimension shape."""

import pandas as pd
from pyspark.sql import functions as F

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_events_enrich_stream_equals_batch(spark):
    from geo_spark.streaming.joins import (
        interval_enrich_join,
        run_events_enrich_available_now,
    )

    sunk = run_events_enrich_available_now(
        spark, EVENTS, sink_name="enrich_parity_sink"
    )
    got = (
        sunk.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("event_type")
        .collect()
    )

    ev = spark.read.parquet(EVENTS).withColumn("ts", F.col("ts").cast("timestamp"))
    fact = ev.filter(F.col("event_type") != "signup")
    dim = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("effective_ts"),
        F.col("value").alias("segment_value"),
    )
    exp = (
        interval_enrich_join(fact, dim, key="user_id", fact_ts="ts")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    assert len(got) > 0 and sum(r["n"] for r in got) > 0


def test_tile_region_join_batch_shape(spark):
    # the geo instantiation: points enriched with versioned tile->region
    # assignments; version 2 takes over tile (0-ish) after 01:00
    from geo_spark.streaming.joins import streaming_tile_region_join

    pts = spark.createDataFrame(
        [
            (1, "2024-01-01 00:30:00", 1.0, 1.0),
            (2, "2024-01-01 01:30:00", 1.0, 1.0),
            (3, "2024-01-01 00:30:00", 100.0, 40.0),
        ],
        "id long, warc_ts string, lon double, lat double",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    from geo_spark.functions import cell_encode_col

    tiles = {
        r["id"]: r["tile"]
        for r in pts.select(
            "id", cell_encode_col("lon", "lat", 4).alias("tile")
        ).collect()
    }
    dim = spark.createDataFrame(
        [
            (tiles[1], "2024-01-01 00:00:00", "region_a"),
            (tiles[1], "2024-01-01 01:00:00", "region_b"),
            (tiles[3], "2024-01-01 00:00:00", "region_c"),
        ],
        "tile long, effective_ts string, region_id string",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))

    out = streaming_tile_region_join(pts, dim, res=4, validity="1 hour").select(
        "id", "dim_region_id"
    )
    got = sorted((r["id"], r["dim_region_id"]) for r in out.collect())
    assert got == [(1, "region_a"), (2, "region_b"), (3, "region_c")]
