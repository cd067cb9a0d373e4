"""SQL Column expressions must match the numpy kernels bit-for-bit."""

import numpy as np
from pyspark.sql import functions as F

from geo_spark.functions import (
    cell_encode_col,
    cell_parent_col,
    haversine_meters,
    rhumb_meters,
)
from geo_spark.index.cells import cell_encode, cell_parent
from geo_spark.kernels import haversine_distance, rhumb_distance


def _coords_df(spark, n=500):
    return spark.range(n).select(
        (F.pmod(F.col("id") * 2654435761, F.lit(360000000)) / 1e6 - 180.0).alias("lon"),
        (F.pmod(F.col("id") * 2246822519, F.lit(178000000)) / 1e6 - 89.0).alias("lat"),
        (F.pmod(F.col("id") * 40503, F.lit(360000000)) / 1e6 - 180.0).alias("lon2"),
        (F.pmod(F.col("id") * 65537, F.lit(178000000)) / 1e6 - 89.0).alias("lat2"),
    )


def test_cell_encode_sql_matches_numpy(spark):
    for res in (4, 8, 12, 16):
        pdf = (
            _coords_df(spark)
            .withColumn("cell", cell_encode_col("lon", "lat", res))
            .toPandas()
        )
        expected = cell_encode(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), res)
        assert (pdf["cell"].to_numpy() == expected).all()


def test_cell_parent_sql_matches_numpy(spark):
    pdf = (
        _coords_df(spark)
        .withColumn("cell", cell_encode_col("lon", "lat", 12))
        .withColumn("parent", cell_parent_col("cell", 4))
        .toPandas()
    )
    expected = cell_parent(pdf["cell"].to_numpy(), 4)
    assert (pdf["parent"].to_numpy() == expected).all()
    # parent of the encode == encode at coarser res
    coarser = cell_encode(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 8)
    assert (pdf["parent"].to_numpy() == coarser).all()


def test_haversine_sql_matches_numpy(spark):
    pdf = (
        _coords_df(spark)
        .withColumn("d", haversine_meters("lon", "lat", "lon2", "lat2"))
        .toPandas()
    )
    expected = haversine_distance(
        pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), pdf["lon2"].to_numpy(), pdf["lat2"].to_numpy()
    )
    # JVM and numpy trig differ in the final ulp; the integer cell path is
    # exact (above), the float distance path is ulp-equal
    assert np.allclose(pdf["d"].to_numpy(), expected, rtol=1e-12, atol=1e-6)


def test_rhumb_sql_matches_numpy(spark):
    pdf = (
        _coords_df(spark)
        .withColumn("d", rhumb_meters("lon", "lat", "lon2", "lat2"))
        .toPandas()
    )
    expected = rhumb_distance(
        pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), pdf["lon2"].to_numpy(), pdf["lat2"].to_numpy()
    )
    assert np.allclose(pdf["d"].to_numpy(), expected, rtol=1e-12, atol=1e-9, equal_nan=True)
