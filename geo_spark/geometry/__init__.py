from geo_spark.geometry.wkt import parse_wkt, to_wkt  # noqa: F401
