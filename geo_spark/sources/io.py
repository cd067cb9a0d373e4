"""Materialized doc_points table: the engine's primary derived dataset.

North-rule items implemented here:

- ``doc_points(url, doc_id?, lon, lat, cell_r{res}...)`` — coordinates
  extracted once, multi-resolution Z-order cell columns attached (pure SQL
  bit math);
- **explicit repartitionByRange on the cell prefix** before writing, plus
  ``sortWithinPartitions(cell)`` so parquet row-group min/max stats are
  tight — a cell-range predicate then prunes both files and row groups at
  scan time (the columnar analogue of the reference's packed STR ranges);
- readers get helper predicates (``cells_between``) that Catalyst pushes
  down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import cell_encode_col

DEFAULT_RESOLUTIONS = (4, 8, 12)


def with_cell_columns(points: DataFrame, resolutions=DEFAULT_RESOLUTIONS) -> DataFrame:
    out = points
    for r in resolutions:
        out = out.withColumn(f"cell_r{r}", cell_encode_col("lon", "lat", r))
    return out


def write_doc_points(
    points: DataFrame,
    path: str,
    resolutions=DEFAULT_RESOLUTIONS,
    range_partition_res: int = 8,
    num_partitions: int | None = None,
) -> None:
    """Extract-once layout: range-partitioned and sorted by the cell id."""
    df = with_cell_columns(points, resolutions)
    key = f"cell_r{range_partition_res}"
    if num_partitions is None:
        num_partitions = max(points.sparkSession.sparkContext.defaultParallelism, 8)
    (
        df.repartitionByRange(num_partitions, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_doc_points(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def cells_between(res: int, cell_lo: int, cell_hi: int):
    """Pushdown-friendly cell-range predicate for a doc_points scan."""
    c = F.col(f"cell_r{res}")
    return (c >= F.lit(cell_lo)) & (c <= F.lit(cell_hi))
