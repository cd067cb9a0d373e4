"""kNN join via cell ring expansion + exact distance refine + windowed top-k.

The distributed re-expression of the reference's BallTree kNN
(``geo/src/algorithm/ball_tree.rs:380-563``): instead of a driver-side tree,
candidates come from a cell-grid equi-join —

1. both sides get a Z-order cell id at a resolution chosen so a 3×3 cell
   neighborhood is expected to hold ≥ k targets;
2. each query explodes to its 3×3 neighbor cells (``disk_cells``) and
   equi-joins targets on the cell id — a plain shuffle join Catalyst/AQE can
   re-plan and skew-split;
3. exact distances (haversine SQL by default — JVM-side) + a
   ``Window.partitionBy(qid).orderBy(dist, tid)`` top-k;
4. queries left under-filled (sparse neighborhoods) retry against a coarser
   resolution (4 levels up → 16× cell area), and as a last resort the
   remaining stragglers (a tiny set by construction) brute-force against the
   full target table.

Result ordering matches BallTree semantics: ascending distance, ties broken
by target id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_spark.functions import cell_encode_col, euclidean_meters, haversine_meters


def _with_disk_cells(df: DataFrame, lon: str, lat: str, res: int) -> DataFrame:
    """Explode each row into its 3×3 cell neighborhood at ``res`` (pure SQL).

    Neighbors are computed in grid space (ix±1, iy±1 → re-interleave) with
    Column math only; longitude wraps, latitude clamps at the poles.
    """
    n = 1 << res
    ix = F.floor((F.col(lon) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    iy = F.floor((F.col(lat) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    ix = F.greatest(F.lit(0), F.least(ix, F.lit(n - 1))).cast("long")
    iy = F.greatest(F.lit(0), F.least(iy, F.lit(n - 1))).cast("long")
    df = df.withColumn("_ix", ix).withColumn("_iy", iy)
    offsets = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    df = df.withColumn("_o", F.explode(offsets))
    nx = F.pmod(F.col("_ix") + F.col("_o.dx"), F.lit(n))  # lon wraps
    ny = F.col("_iy") + F.col("_o.dy")
    df = df.filter((ny >= 0) & (ny < n))
    from geo_spark.functions import _spread_bits_col, _Z_BITS

    z = _spread_bits_col(nx).bitwiseOR(F.shiftleft(_spread_bits_col(ny.cast("long")), 1))
    return df.withColumn("_cell", F.lit(res << _Z_BITS).bitwiseOR(z).cast("long")).drop(
        "_ix", "_iy", "_o"
    )


def _dist_col(metric: str, qlon, qlat, tlon, tlat):
    if metric == "haversine":
        return haversine_meters(qlon, qlat, tlon, tlat)
    if metric == "planar":
        return euclidean_meters(qlon, qlat, tlon, tlat)
    if metric == "planar_sq":
        dx = F.col(qlon) - F.col(tlon)
        dy = F.col(qlat) - F.col(tlat)
        return dx * dx + dy * dy
    raise ValueError(f"unknown metric: {metric}")


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    res: int = 6,
    metric: str = "haversine",
    query_id: str = "qid",
    target_id: str = "tid",
    coarse_retry_levels: int = 4,
    exclude_self: bool = False,
) -> DataFrame:
    """Return (query cols..., tid, dist, rank) — the k nearest targets per query.

    ``queries`` needs (query_id, lon, lat); ``targets`` (target_id, lon, lat).
    """
    q = queries.select(query_id, F.col("lon").alias("_qlon"), F.col("lat").alias("_qlat"))
    t = targets.select(target_id, F.col("lon").alias("_tlon"), F.col("lat").alias("_tlat"))

    def topk(cand: DataFrame) -> DataFrame:
        d = cand.withColumn("dist", _dist_col(metric, "_qlon", "_qlat", "_tlon", "_tlat"))
        if exclude_self:
            d = d.filter(F.col(query_id) != F.col(target_id))
        w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(target_id).asc())
        return d.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

    def candidates_at(res_: int) -> DataFrame:
        qd = _with_disk_cells(q, "_qlon", "_qlat", res_)
        td = t.withColumn("_cell", cell_encode_col("_tlon", "_tlat", res_))
        return qd.join(td, "_cell").drop("_cell")

    result = topk(candidates_at(res))
    # under-filled queries retry coarser, then brute-force the remainder
    filled = result.groupBy(query_id).agg(F.count("*").alias("_n")).filter(F.col("_n") >= k)
    stragglers = q.join(filled.select(query_id), query_id, "left_anti")
    retry_res = max(res - coarse_retry_levels, 0)
    if retry_res < res:
        qd = _with_disk_cells(stragglers, "_qlon", "_qlat", retry_res)
        td = t.withColumn("_cell", cell_encode_col("_tlon", "_tlat", retry_res))
        retry = topk(qd.join(td, "_cell").drop("_cell"))
        filled2 = retry.groupBy(query_id).agg(F.count("*").alias("_n")).filter(F.col("_n") >= k)
        still = stragglers.join(filled2.select(query_id), query_id, "left_anti")
        brute = topk(still.crossJoin(t))
        retry_ok = retry.join(filled2.select(query_id), query_id, "left_semi")
        result = result.join(filled.select(query_id), query_id, "left_semi")
        result = result.unionByName(retry_ok).unionByName(brute)
    out = result.drop("_n").withColumnRenamed("_qlon", "qlon").withColumnRenamed("_qlat", "qlat")
    return out.withColumnRenamed("_tlon", "tlon").withColumnRenamed("_tlat", "tlat")
