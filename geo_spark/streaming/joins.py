"""Structured Streaming: stream-stream interval joins.

The remaining streaming shape after tiles/sessionize/dedup: a fact stream
joined to a SLOWLY-CHANGING dimension that itself arrives as a stream
(dimension-version records with an effective timestamp). The join condition
is an equi-key plus an event-time validity range, so Spark can bound both
join-state buffers with the watermarks — the canonical scale-safe
stream-stream enrich (no broadcast refresh, no static-table restart).

Two instantiations:
  - ``interval_enrich_join``: generic (key, ts) fact × (key, effective_ts)
    dimension-version stream, validity-windowed.
  - ``streaming_tile_region_join``: geo shape — tile-keyed points enriched
    with the tile→region dimension stream (region re-assignments flow as
    new versions).

State bound: each side buffers only rows younger than
watermark + validity; inner join emits exactly the batch-equivalent rows
(stream==batch parity is pytest-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def interval_enrich_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str = "ts",
    dim_ts: str = "effective_ts",
    validity: str = "7 days",
    watermark: str = "30 days",
    dim_prefix: str = "dim_",
) -> DataFrame:
    """Inner join fact rows to every dimension version whose validity window
    ``[dim_ts, dim_ts + validity)`` covers the fact's event time.

    Dimension columns (except the key) come back prefixed with
    ``dim_prefix``. Both inputs may be streaming or batch DataFrames — the
    same plan runs in either mode, which is what the parity test exploits.
    """
    if fact.isStreaming:
        fact = fact.withWatermark(fact_ts, watermark)
    if dim.isStreaming:
        dim = dim.withWatermark(dim_ts, watermark)
    d = dim.select(
        F.col(key),
        *[
            F.col(c).alias(f"{dim_prefix}{c}")
            for c in dim.columns
            if c != key
        ],
    )
    dts = f"{dim_prefix}{dim_ts}"
    cond = (
        (fact[key] == d[key])
        & (fact[fact_ts] >= d[dts])
        & (fact[fact_ts] < d[dts] + F.expr(f"INTERVAL {validity}"))
    )
    return fact.join(d, cond, "inner").drop(d[key])


def streaming_tile_region_join(
    points: DataFrame,
    region_versions: DataFrame,
    res: int = 4,
    validity: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Geo shape: a (lon, lat, ts) point stream tile-encoded and enriched
    with the streaming tile→region dimension (columns
    ``tile, effective_ts, region_id, ...``)."""
    from geo_spark.functions import cell_encode_col

    pts = points.withColumn("tile", cell_encode_col("lon", "lat", res))
    return interval_enrich_join(
        pts,
        region_versions,
        key="tile",
        fact_ts=ts_col,
        dim_ts="effective_ts",
        validity=validity,
        watermark=watermark,
    )


def run_events_enrich_available_now(
    spark: SparkSession,
    events_path: str,
    validity: str = "7 days",
    sink_name: str = "enrich_sink",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drive the stream-stream join over the events table with
    ``availableNow`` triggers: 'signup' events are the dimension-version
    stream (a user's segment becomes effective at signup time and lasts
    ``validity``); all other events are the fact stream. Returns the sunk
    joined rows (append mode — inner interval joins emit exactly the
    batch-equivalent result).

    ``state_partitions``: override spark.sql.shuffle.partitions for this
    query's state stores (None = inherit the session setting — the right
    choice at scale; small drivers pass a small count so state-store init
    stays proportional to the data)."""
    from geo_spark.streaming.dedup import as_stream_dir

    path = as_stream_dir(events_path)
    schema = spark.read.parquet(path).schema

    # ONE file source feeds both join sides (stream self-join): two separate
    # sources would each scan the parquet and track offsets independently,
    # doubling the per-batch read. Watermarks need TIMESTAMP (LTZ); the
    # events table stores NTZ. Both join sides shift identically, so the
    # validity join is timezone-invariant.
    src = spark.readStream.schema(schema).parquet(path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    fact = src.filter(F.col("event_type") != "signup")
    dim = (
        src
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("effective_ts"),
            F.col("value").alias("segment_value"),
        )
    )
    joined = interval_enrich_join(
        fact, dim, key="user_id", fact_ts="ts", dim_ts="effective_ts",
        validity=validity,
    )
    # the join-state stores are partitioned by spark.sql.shuffle.partitions,
    # fixed at the query's FIRST start; a bounded count keeps the
    # state-store init cost proportional to the data, not the session's
    # batch-shuffle setting (restore the session conf right after start)
    from geo_spark.streaming.dedup import _NoDataBatches, _StatePartitions

    with _StatePartitions(spark, state_partitions), _NoDataBatches(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)
