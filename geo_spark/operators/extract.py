"""Coordinate extraction from web-page text — fully JVM-side.

The pipeline contract (BASELINE.json ``input_hint``) requires the extracted
``text`` to stay byte-identical per url: extraction therefore only *reads*
``text`` — it never rewrites it — and the output carries the original column
through untouched. Documents embed ``geo:<lat_microdeg>,<lon_microdeg>``
markers; `regexp_extract_all` (a built-in Catalyst expression — no Python)
pulls all markers, `arrays_zip` + `explode` fan out one row per point.

Zero-marker documents drop out of the point table (inner explode) but remain
available in the source table; multi-marker documents produce several rows
with a ``point_idx`` disambiguator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARKER_RE = r"geo:(-?\d+),(-?\d+)"


def extract_points(documents: DataFrame, keep_text: bool = False) -> DataFrame:
    """documents(url, text, ...) → doc_points(url, point_idx, lon, lat).

    ``keep_text=True`` also carries ``text`` through unmodified so the
    byte-identity invariant can be checked downstream.
    """
    # single regex pass (group 0 = whole marker), then cheap substring splits
    # — regexp_extract_all is the dominant CPU cost of the pipeline, one pass
    # instead of two nearly halves extraction time
    markers = F.regexp_extract_all("text", F.lit(MARKER_RE), 0)
    cols = ["url"]
    if keep_text:
        cols.append("text")
    exploded = (
        documents.select(*cols, F.posexplode(markers).alias("point_idx", "m"))
        .withColumn("_body", F.substring(F.col("m"), 5, 64))  # strip 'geo:'
        .withColumn(
            "lat",
            F.substring_index("_body", ",", 1).cast("long") / F.lit(1_000_000.0),
        )
        .withColumn(
            "lon",
            F.substring_index("_body", ",", -1).cast("long") / F.lit(1_000_000.0),
        )
        .drop("m", "_body")
    )
    return exploded
