"""Raster↔vector tile aggregation: cell-keyed rollups of point/geometry data.

Tiles are Z-order cells; a rollup from resolution r to r-s is a pure-SQL
``cell_parent_col`` (drop 2s interleaved bits — no re-encode, no shuffle of
the raw points beyond the single groupBy). Skewed hot tiles (power-law web
data) are handled by two-phase salted aggregation: partial counts on
(cell, salt) then a final combine on cell — the classic map-side-combine
shape, with AQE coalescing the second stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import _Z_BITS, cell_encode_col, cell_parent_col


def _unspread_bits_col(v):
    """Gather even bit positions into the low bits (inverse of spreading)."""
    m = F.lit
    v = v.bitwiseAND(m(0x5555555555555555))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 1))).bitwiseAND(m(0x3333333333333333))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 2))).bitwiseAND(m(0x0F0F0F0F0F0F0F0F))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 4))).bitwiseAND(m(0x00FF00FF00FF00FF))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 8))).bitwiseAND(m(0x0000FFFF0000FFFF))
    v = (v.bitwiseOR(F.shiftrightunsigned(v, 16))).bitwiseAND(m(0x00000000FFFFFFFF))
    return v


def cell_xy_cols(cell):
    """Decode a cell id into (ix, iy) grid Columns — pure SQL bit math."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    z = cell.bitwiseAND(F.lit((1 << _Z_BITS) - 1))
    ix = _unspread_bits_col(z)
    iy = _unspread_bits_col(F.shiftrightunsigned(z, 1))
    return ix.cast("long"), iy.cast("long")


def tile_counts(
    points: DataFrame,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt_buckets: int = 0,
    extra_aggs: list | None = None,
) -> DataFrame:
    """Count (and optionally aggregate) points per tile at ``res``.

    ``salt_buckets > 0`` enables two-phase salted aggregation for hot cells.
    Output: (tile, ix, iy, n [, extra aggs...]).
    """
    df = points.withColumn("tile", cell_encode_col(lon_col, lat_col, res))
    aggs = [F.count("*").alias("n")] + list(extra_aggs or [])
    if salt_buckets > 0:
        df = df.withColumn(
            "_salt", F.pmod(F.hash(F.col(lon_col), F.col(lat_col)), F.lit(salt_buckets))
        )
        # phase 1: partial agg on (tile, salt); phase 2: combine on tile.
        # Only count/sum-style aggs are salt-combinable; callers needing
        # other aggregates use salt_buckets=0 (AQE skew handling applies).
        partial = df.groupBy("tile", "_salt").agg(F.count("*").alias("_pn"))
        out = partial.groupBy("tile").agg(F.sum("_pn").alias("n"))
    else:
        out = df.groupBy("tile").agg(*aggs)
    ix, iy = cell_xy_cols("tile")
    return out.withColumn("ix", ix).withColumn("iy", iy)


def tile_rollup(tiles: DataFrame, steps: int, count_col: str = "n") -> DataFrame:
    """Roll tile counts up ``steps`` resolution levels (parent-cell combine)."""
    out = (
        tiles.withColumn("tile", cell_parent_col("tile", steps))
        .groupBy("tile")
        .agg(F.sum(count_col).alias(count_col))
    )
    ix, iy = cell_xy_cols("tile")
    return out.withColumn("ix", ix).withColumn("iy", iy)
