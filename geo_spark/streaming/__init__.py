from geo_spark.streaming.tiles import streaming_tile_counts  # noqa: F401
