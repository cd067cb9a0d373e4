from geo_spark.operators.extract import extract_points  # noqa: F401
from geo_spark.operators.pip_join import pip_join_points_polygons  # noqa: F401
