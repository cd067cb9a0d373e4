"""DataFrame surface for boolean overlay: per-pair ops and distributed union.

- ``overlay_pairs``: one overlay per row over two polygon columns
  (array<struct<x,y>> exterior + nested interiors), vectorized per Arrow
  batch; returns the result as a multipolygon column plus its area.
- ``distributed_unary_union``: n-way union of a polygon table — the Spark
  shape of the reference's ``unary_union`` (``bool_ops/mod.rs:259-288``):
  polygons group by a coarse cell of their bbox center, each cell unions
  locally (``applyInPandas``), then cell results merge hierarchically by
  parent cell until one group remains. Polygons only merge across cells at
  the merge levels, so the shuffle volume at each level is the (small)
  cell-result set, not the input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIPOLY_TYPE = (
    "array<struct<exterior:array<struct<x:double,y:double>>,"
    "interiors:array<array<struct<x:double,y:double>>>>>"
)


def _poly_to_np(poly):
    ext = np.asarray([(c["x"], c["y"]) for c in poly["exterior"]], dtype=np.float64)
    holes = [
        np.asarray([(c["x"], c["y"]) for c in ring], dtype=np.float64)
        for ring in (poly["interiors"] or [])
    ]
    return ext, holes


def _result_to_rows(results):
    return [
        {
            "exterior": [{"x": float(x), "y": float(y)} for x, y in ext],
            "interiors": [
                [{"x": float(x), "y": float(y)} for x, y in h] for h in holes
            ],
        }
        for ext, holes in results
    ]


def overlay_pairs(
    df: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    op: str = "intersection",
) -> DataFrame:
    """Adds ``result`` (multipolygon) and ``result_area`` columns.

    ``a_col``/``b_col`` are struct columns with fields exterior/interiors.
    """

    @F.pandas_udf(MULTIPOLY_TYPE)
    def overlay_udf(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
        # struct columns arrive as pandas DataFrames (one column per field)
        from geo_spark.kernels.boolops import boolean_op

        out = []
        for i in range(len(a)):
            pa = {"exterior": a["exterior"].iloc[i], "interiors": a["interiors"].iloc[i]}
            pb = {"exterior": b["exterior"].iloc[i], "interiors": b["interiors"].iloc[i]}
            ea, ha = _poly_to_np(pa)
            eb, hb = _poly_to_np(pb)
            out.append(_result_to_rows(boolean_op(ea, ha, eb, hb, op)))
        return pd.Series(out)

    @F.pandas_udf(T.DoubleType())
    def area_udf(res: pd.Series) -> pd.Series:
        from geo_spark.kernels.area import ring_signed_area

        vals = []
        for polys in res:
            total = 0.0
            for p in polys or []:
                ext, holes = _poly_to_np(p)
                total += abs(ring_signed_area(ext))
                for h in holes:
                    total -= abs(ring_signed_area(h))
            vals.append(total)
        return pd.Series(vals)

    out = df.withColumn("result", overlay_udf(F.col(a_col), F.col(b_col)))
    return out.withColumn("result_area", area_udf(F.col("result")))


def distributed_unary_union(
    polygons: DataFrame,
    res: int = 4,
    merge_levels: int = 2,
) -> list:
    """Union every polygon in the table; returns the final (small) result as
    a local list of (exterior, holes) numpy pairs.

    Level 0 groups by the bbox-center cell at ``res``; each merge level drops
    2 resolution steps. The final cross-group union runs on the driver over
    the few surviving pieces.
    """
    from geo_spark.functions import cell_encode_col

    df = polygons.select("exterior", "interiors", "xmin", "ymin", "xmax", "ymax")
    df = df.withColumn(
        "_cell",
        cell_encode_col(
            (F.col("xmin") + F.col("xmax")) / 2.0,
            (F.col("ymin") + F.col("ymax")) / 2.0,
            res,
        ),
    )

    poly_schema = (
        "cell long, exterior array<struct<x:double,y:double>>, "
        "interiors array<array<struct<x:double,y:double>>>"
    )

    def union_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from geo_spark.kernels.boolops import unary_union

        polys = []
        for _, row in pdf.iterrows():
            polys.append(_poly_to_np({"exterior": row["exterior"], "interiors": row["interiors"]}))
        merged = unary_union(polys)
        rows = _result_to_rows(merged)
        return pd.DataFrame(
            {
                "cell": [pdf["_cell"].iloc[0]] * len(rows),
                "exterior": [r["exterior"] for r in rows],
                "interiors": [r["interiors"] for r in rows],
            }
        )

    level = polygons.sparkSession.createDataFrame([], schema=poly_schema)
    level = df.groupBy("_cell").applyInPandas(union_group, schema=poly_schema)

    from geo_spark.functions import cell_parent_col

    for _ in range(merge_levels):
        level = (
            level.withColumn("_cell", cell_parent_col("cell", 2))
            .drop("cell")
            .groupBy("_cell")
            .applyInPandas(union_group, schema=poly_schema)
        )

    from geo_spark.kernels.boolops import unary_union

    # Final-stage guard: the driver fold is for the tiny cross-cell residue
    # only. An adversarial input (every piece crossing cells at every merge
    # level) would otherwise collect the whole table; fail loudly instead
    # of silently OOMing the driver. The checkpoint makes the count and the
    # collect read the same materialization (no double compute).
    max_driver_pieces = 100_000
    level = level.localCheckpoint(eager=True)
    n_left = level.count()
    if n_left > max_driver_pieces:
        raise RuntimeError(
            f"distributed_unary_union: {n_left} pieces survive "
            f"{merge_levels} merge levels (> {max_driver_pieces}); raise "
            "merge_levels/res so the cross-cell residue fits the driver fold"
        )
    local = [
        _poly_to_np({"exterior": r["exterior"], "interiors": r["interiors"]})
        for r in level.collect()
    ]
    return unary_union(local)


def mixed_overlay_stats(
    ext_a: "Column", ints_a: "Column", ext_b: "Column", ints_b: "Column", op: str
) -> "Column":
    """struct<n_polys,poly_area,n_segs,seg_len,n_points>: the heterogeneous
    overlay of two polygon columns (kernels/overlay_mixed.mixed_overlay —
    the GeometryCollection-shaped result JTS OverlayNG produces: area pieces
    + collapsed/shared-boundary line pieces + isolated touch points).
    """
    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.overlay_mixed import mixed_overlay

    @F.pandas_udf(
        "struct<n_polys:int,poly_area:double,n_segs:int,seg_len:double,n_points:int>"
    )
    def udf(ea: pd.Series, ia: pd.Series, eb: pd.Series, ib: pd.Series) -> pd.DataFrame:
        import numpy as np

        cols = {"n_polys": [], "poly_area": [], "n_segs": [], "seg_len": [], "n_points": []}
        for i in range(len(ea)):
            def poly(ext, ints):
                rings = [np.asarray([(c["x"], c["y"]) for c in ext], dtype=np.float64)]
                for ring in ints or []:
                    rings.append(np.asarray([(c["x"], c["y"]) for c in ring], dtype=np.float64))
                return ("Polygon", rings)

            pts, segs, polys = mixed_overlay(
                poly(ea.iloc[i], ia.iloc[i]), poly(eb.iloc[i], ib.iloc[i]), op
            )
            area = 0.0
            for ext, holes in polys:
                area += abs(ring_signed_area(np.asarray(ext, dtype=np.float64)))
                for h in holes:
                    area -= abs(ring_signed_area(np.asarray(h, dtype=np.float64)))
            slen = sum(
                float(np.hypot(b[0] - a[0], b[1] - a[1])) for a, b in segs
            )
            cols["n_polys"].append(len(polys))
            cols["poly_area"].append(area)
            cols["n_segs"].append(len(segs))
            cols["seg_len"].append(slen)
            cols["n_points"].append(len(pts))
        return pd.DataFrame(cols)

    return udf(ext_a, ints_a, ext_b, ints_b)
