"""Structured Streaming: windowed tile counts over a document stream.

The reference has no streaming (SURVEY.md §2.7); this is the engine's
Spark-native extension: ingest CC-style documents as a stream, extract
coordinates, assign Z-order tiles, and maintain event-time windowed counts
with a watermark on ``warc_ts`` for late data. The aggregation state is
keyed by (window, tile) — bounded by watermark horizon × active tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import cell_encode_col
from geo_spark.operators.extract import MARKER_RE


def streaming_tile_counts(
    stream: DataFrame,
    res: int = 4,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """documents stream (url, warc_ts, text, ...) → (window, tile, n).

    Fully JVM-side: regex extraction + cell encode are Catalyst expressions,
    so the streaming plan needs no Python workers.
    """
    markers = F.regexp_extract_all("text", F.lit(MARKER_RE), 0)
    pts = (
        stream.withWatermark("warc_ts", watermark)
        .select("url", "warc_ts", F.explode(markers).alias("m"))
        .withColumn("_body", F.substring(F.col("m"), 5, 64))
        .withColumn("lat", F.substring_index("_body", ",", 1).cast("long") / 1_000_000.0)
        .withColumn("lon", F.substring_index("_body", ",", -1).cast("long") / 1_000_000.0)
    )
    tiles = pts.withColumn("tile", cell_encode_col("lon", "lat", res))
    return (
        tiles.groupBy(F.window("warc_ts", window).alias("win"), "tile")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "tile",
            "n",
        )
    )
