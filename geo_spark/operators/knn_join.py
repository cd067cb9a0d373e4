"""kNN join via cell ring expansion + exact distance refine + windowed top-k.

The distributed re-expression of the reference's BallTree kNN
(``geo/src/algorithm/ball_tree.rs:380-563``): instead of a driver-side tree,
candidates come from a cell-grid equi-join —

1. both sides get a Z-order cell id at a resolution chosen so a ring cell
   neighborhood is expected to hold ≥ k targets;
2. each query explodes to its ring of neighbor cells (``disk_cells``) and
   equi-joins targets on the cell id — a plain shuffle join Catalyst/AQE can
   re-plan and skew-split. For the haversine metric the longitude ring is
   widened per row by ~1/cos(lat) so that the ring covers the same metric
   radius in every direction at every latitude (degree cells shrink
   longitudinally toward the poles);
3. exact distances (haversine SQL by default — JVM-side) + a
   ``Window.partitionBy(qid).orderBy(dist, tid)`` top-k;
4. a query's result is only *certified* when its k-th distance fits inside
   the radius the ring provably covered (so a full-looking top-k built from
   in-ring decoys can never mask a true neighbor outside the ring).
   Uncertified queries retry against a coarser resolution (4 levels up →
   16× cell area) with the same certificate, and as a last resort the
   remaining stragglers (a tiny set by construction) brute-force against the
   full target table — the exactness backstop.

Result ordering matches BallTree semantics: ascending distance, ties broken
by target id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from geo_spark.functions import (
    MEAN_EARTH_RADIUS,
    cell_encode_col,
    euclidean_meters,
    haversine_meters,
)

# meters per degree of latitude on the haversine sphere (R = 6371008.8)
_M_PER_DEG = math.pi * MEAN_EARTH_RADIUS / 180.0


def _lon_ring_width_col(lat_col, res: int, need_lon_deg=None):
    """Per-row half-width (in cells) of the longitude ring at ``res``.

    Rigorous coverage bound: for two points within the block's latitude
    band, haversine distance d and longitude separation Δλ (degrees) obey
    d ≥ (2/π)·R·cos(φmax)·Δλ_rad, i.e. Δλ_deg ≤ 90·d/(R·cos φmax).
    Given a required longitudinal reach ``need_lon_deg`` (a Column, degrees)
    the ring must span ceil(need/lon_cell_width) cells. With no explicit
    need, the ring is sized so its longitudinal metric reach matches the
    ±1-cell latitudinal reach: wx = ceil((π/4)/cos φmax) (lon cells are 2×
    as wide as lat cells in degrees).
    """
    n = 1 << res
    lon_w = 360.0 / n
    h_lat = 180.0 / n
    eff_lat = F.least(F.abs(lat_col) + F.lit(2.0 * h_lat), F.lit(89.999))
    cos_max = F.cos(F.radians(eff_lat))
    if need_lon_deg is None:
        wx = F.ceil(F.lit(math.pi / 4.0) / cos_max)
    else:
        wx = F.ceil(need_lon_deg / F.lit(lon_w) / cos_max)
    return F.least(F.greatest(wx, F.lit(1)), F.lit(n // 2 + 1)).cast("int")


def _with_disk_cells(df: DataFrame, lon: str, lat: str, res: int, lon_ring=None) -> DataFrame:
    """Explode each row into its cell-ring neighborhood at ``res`` (pure SQL).

    ``lon_ring``: optional Column — per-row half-width of the longitude ring
    in cells (default 1 → the classic 3×3 block). Latitude stays ±1 because
    degree-cells never shrink latitudinally. Neighbors are computed in grid
    space (ix±dx, iy±1 → re-interleave) with Column math only; longitude
    wraps, latitude clamps at the poles.
    """
    n = 1 << res
    ix = F.floor((F.col(lon) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    iy = F.floor((F.col(lat) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    ix = F.greatest(F.lit(0), F.least(ix, F.lit(n - 1))).cast("long")
    iy = F.greatest(F.lit(0), F.least(iy, F.lit(n - 1))).cast("long")
    df = df.withColumn("_ix", ix).withColumn("_iy", iy)
    if lon_ring is None:
        offsets = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                            for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    else:
        # variable-width ring: flatten sequence(-wx..wx) × (-1,0,1)
        offsets = F.flatten(
            F.transform(
                F.sequence(-lon_ring, lon_ring),
                lambda dx: F.array(*[
                    F.struct(dx.cast("int").alias("dx"), F.lit(dy).alias("dy"))
                    for dy in (-1, 0, 1)
                ]),
            )
        )
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


def _covered_radius_col(metric: str, lat_col, res: int):
    """Radius (in the metric's own units) the ring at ``res`` provably covers.

    Any point strictly farther than this from the query is guaranteed to lie
    inside the joined cell block, so a top-k whose k-th distance is within
    this radius is exact. Lower bounds used (conservative):
    latitude: d ≥ R·Δφ_rad → 1 full cell covers h_lat·(πR/180) meters;
    longitude: d ≥ (2/π)·R·cos(φmax)·Δλ_rad over a ring of wx cells.
    """
    n = 1 << res
    h_lat = 180.0 / n
    if metric == "planar":
        return F.lit(h_lat)
    if metric == "planar_sq":
        return F.lit(h_lat * h_lat)
    # haversine (meters)
    eff_lat = F.least(F.abs(lat_col) + F.lit(2.0 * h_lat), F.lit(89.999))
    cos_max = F.cos(F.radians(eff_lat))
    wx = _lon_ring_width_col(lat_col, res)
    lat_cover = F.lit(_M_PER_DEG * h_lat)
    lon_cover = F.lit((4.0 / math.pi) * _M_PER_DEG * h_lat) * cos_max * wx.cast("double")
    # full longitude wrap (2·wx+1 ≥ n): the ring covers every lon column, so
    # the only way out of the block is ≥ 1 full latitude cell — the lon term
    # (which collapses near the poles / at coarse res) no longer applies.
    # This keeps the certificate sound while rescuing coarse-res and
    # high-latitude queries from a needless retry cascade.
    full_wrap = (wx * 2 + F.lit(1)) >= F.lit(n)
    return F.when(full_wrap, lat_cover).otherwise(F.least(lat_cover, lon_cover))


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
    stats_out: dict | None = None,
) -> DataFrame:
    """Return (query cols..., tid, dist, rank) — the k nearest targets per query.

    ``queries`` needs (query_id, lon, lat); ``targets`` (target_id, lon, lat).
    Exact for every metric: results are certified against the ring's covered
    radius; uncertified queries retry at progressively coarser levels
    (``res - coarse_retry_levels``, ``res - 2·coarse_retry_levels``, … down
    to level 1), and only the remainder still uncertified at level 1 — a
    provably sparse tail (its 3×3 neighborhood at level 1 spans ≥ a
    hemisphere) — takes the brute cross-join. ``stats_out`` (tests): filled
    with ``brute_queries`` = the brute remainder count.
    """
    q = queries.select(query_id, F.col("lon").alias("_qlon"), F.col("lat").alias("_qlat"))
    t = targets.select(target_id, F.col("lon").alias("_tlon"), F.col("lat").alias("_tlat"))

    def topk(cand: DataFrame) -> DataFrame:
        d = cand.withColumn("dist", _dist_col(metric, "_qlon", "_qlat", "_tlon", "_tlat"))
        if exclude_self:
            d = d.filter(F.col(query_id) != F.col(target_id))
        w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(target_id).asc())
        return d.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

    def candidates_at(qdf: DataFrame, res_: int) -> DataFrame:
        ring = _lon_ring_width_col(F.col("_qlat"), res_) if metric == "haversine" else None
        qd = _with_disk_cells(qdf, "_qlon", "_qlat", res_, lon_ring=ring)
        if ring is not None or res_ <= 1:
            # a full-wrap lon ring (near the poles) — or the static ±1 ring at
            # res ≤ 1 where n ≤ 2 columns exist — revisits cells after pmod;
            # duplicate candidates would corrupt row_number ranks. The exploded
            # query side is small (n_queries × ring cells), so dedupe it there.
            qd = qd.dropDuplicates([query_id, "_cell"])
        td = t.withColumn("_cell", cell_encode_col("_tlon", "_tlat", res_))
        return qd.join(td, "_cell").drop("_cell")

    def certified(topk_df: DataFrame, res_: int) -> DataFrame:
        """Query ids whose top-k is provably exact at ``res_``."""
        per_q = topk_df.groupBy(query_id).agg(
            F.count("*").alias("_n"),
            F.max("dist").alias("_kth"),
            F.first("_qlat").alias("_lat"),
        )
        rcov = _covered_radius_col(metric, F.col("_lat"), res_)
        return per_q.filter((F.col("_n") >= k) & (F.col("_kth") <= rcov)).select(query_id)

    first = topk(candidates_at(q, res)).persist(StorageLevel.MEMORY_AND_DISK)
    filled = certified(first, res)
    pieces = [first.join(filled, query_id, "left_semi")]
    stragglers = q.join(filled, query_id, "left_anti")
    # one cheap count per level ends the cascade as soon as the straggler
    # set drains: an empty set would otherwise still schedule the retry and
    # level-1 tail joins — each a full scan + shuffle of the target table —
    # for zero output rows (AQE only discovers the emptiness after the
    # target-side shuffle map stages have run)
    n_strag = stragglers.count()
    level = res
    step = max(coarse_retry_levels, 1)
    while level > 1 and n_strag > 0:
        level = max(level - step, 1)
        if level == 1:
            break
        retry = topk(candidates_at(stragglers, level)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        fl = certified(retry, level)
        pieces.append(retry.join(fl, query_id, "left_semi"))
        stragglers = stragglers.join(fl, query_id, "left_anti")
        n_strag = stragglers.count()
    if stats_out is not None:
        stats_out["brute_queries"] = n_strag
    # Exhaustive tail, still a bucketed join (no crossJoin): at level 1 the
    # 2×2 grid's ±1 wrap makes every target a candidate of every remaining
    # query, so this top-k is exact with NO certificate needed. The tail is
    # only queries uncertified at every coarser ring — a sparse-region/
    # adversarial remainder (bounded in tests via ``stats_out``).
    if n_strag > 0:
        pieces.append(topk(candidates_at(stragglers, 1)))
    from functools import reduce

    result = reduce(lambda a, b: a.unionByName(b), pieces)
    out = result.drop("_n").withColumnRenamed("_qlon", "qlon").withColumnRenamed("_qlat", "qlat")
    return out.withColumnRenamed("_tlon", "tlon").withColumnRenamed("_tlat", "tlat")
