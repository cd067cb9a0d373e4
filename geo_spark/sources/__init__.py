from geo_spark.sources.documents import synth_documents, synth_admin_polygons  # noqa: F401
