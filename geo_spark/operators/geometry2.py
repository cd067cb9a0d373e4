"""Column surface for the construction/validation kernels (batch 2).

Same conventions as operators/scalar.py: geometry in/out as
array<struct<x,y>> (rings) or multipolygon structs, vectorized pandas UDFs
per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geo_spark.operators.boolops import MULTIPOLY_TYPE, _result_to_rows
from geo_spark.operators.scalar import COORDS_TYPE, _to_np, _to_rows


def buffer_ring(coords: Column, r, quad_segs: int = 8) -> Column:
    """Round-join buffer of a closed ring (as polygon) → multipolygon."""

    @F.pandas_udf(MULTIPOLY_TYPE)
    def udf(arrs: pd.Series, dist: pd.Series) -> pd.Series:
        from geo_spark.kernels.buffer import buffer_polygon

        out = []
        for i, arr in enumerate(arrs):
            out.append(
                _result_to_rows(
                    buffer_polygon(_to_np(arr), (), float(dist.iloc[i]), quad_segs)
                )
            )
        return pd.Series(out)

    return udf(coords, F.lit(r).cast("double"))


def relate_polygons(ext_a: Column, ints_a: Column, ext_b: Column, ints_b: Column) -> Column:
    """DE-9IM matrix string for two polygon columns (full RelateComputer
    semantics — kernels.relate2.relate_polygon_pair; parity
    ``relate/relate_operation.rs``, ``intersection_matrix.rs``)."""

    @F.pandas_udf(T.StringType())
    def udf(ea: pd.Series, ia: pd.Series, eb: pd.Series, ib: pd.Series) -> pd.Series:
        from geo_spark.kernels.relate2 import relate_polygon_pair

        out = []
        for i in range(len(ea)):
            ha = [] if ia.iloc[i] is None else [_to_np(h) for h in ia.iloc[i]]
            hb = [] if ib.iloc[i] is None else [_to_np(h) for h in ib.iloc[i]]
            out.append(
                relate_polygon_pair(_to_np(ea.iloc[i]), ha, _to_np(eb.iloc[i]), hb)
            )
        return pd.Series(out)

    return udf(ext_a, ints_a, ext_b, ints_b)


def make_valid_col(exterior: Column, interiors: Column) -> Column:
    """Repair a polygon column (odd-even prepair semantics) → multipolygon.

    Parity: ``MakeValid`` (``repair_polygon/mod.rs``) via
    kernels.repair.make_valid — always emits a valid multipolygon."""

    @F.pandas_udf(MULTIPOLY_TYPE)
    def udf(ext: pd.Series, hol: pd.Series) -> pd.Series:
        from geo_spark.kernels.repair import make_valid

        out = []
        for i in range(len(ext)):
            hs = hol.iloc[i]
            holes = [] if hs is None else [_to_np(h) for h in hs]
            out.append(_result_to_rows(make_valid(_to_np(ext.iloc[i]), holes)))
        return pd.Series(out)

    return udf(exterior, interiors)


def multipolygon_area(mp: Column) -> Column:
    """Unsigned area of a multipolygon column (shoelace; holes subtract).

    Parity: ``Area`` over MultiPolygon (``geo/src/algorithm/area.rs``) —
    sum over pieces of |exterior| − Σ|holes|.
    """

    @F.pandas_udf(T.DoubleType())
    def udf(mps: pd.Series) -> pd.Series:
        from geo_spark.kernels.area import ring_signed_area

        out = []
        for pieces in mps:
            tot = 0.0
            for piece in pieces or []:
                tot += abs(ring_signed_area(_to_np(piece["exterior"])))
                for h in piece["interiors"] or []:
                    tot -= abs(ring_signed_area(_to_np(h)))
            out.append(tot)
        return pd.Series(out)

    return udf(mp)


def concave_hull_points(coords: Column, concavity: float = 2.0) -> Column:
    @F.pandas_udf(COORDS_TYPE)
    def udf(arrs: pd.Series) -> pd.Series:
        from geo_spark.kernels.hull2 import concave_hull

        return pd.Series([_to_rows(concave_hull(_to_np(a), concavity)) for a in arrs])

    return udf(coords)


def triangulate(coords: Column) -> Column:
    """Ear-cut triangle index triples of a ring: array<array<int>>."""

    @F.pandas_udf("array<array<int>>")
    def udf(arrs: pd.Series) -> pd.Series:
        from geo_spark.kernels.geom2 import triangulate_earcut

        return pd.Series(
            [[list(t) for t in triangulate_earcut(_to_np(a))] for a in arrs]
        )

    return udf(coords)


def validity_problems(exterior: Column, interiors: Column) -> Column:
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def udf(ext: pd.Series, hol: pd.Series) -> pd.Series:
        from geo_spark.kernels.geom2 import validate_polygon

        out = []
        for i in range(len(ext)):
            hs = hol.iloc[i]
            holes = [] if hs is None else [_to_np(h) for h in hs]
            out.append(validate_polygon(_to_np(ext.iloc[i]), holes))
        return pd.Series(out)

    return udf(exterior, interiors)


def interior_point_col(exterior: Column, interiors: Column) -> Column:
    @F.pandas_udf("struct<x:double,y:double>")
    def udf(ext: pd.Series, hol: pd.Series) -> pd.DataFrame:
        from geo_spark.kernels.geom2 import interior_point

        xs, ys = [], []
        for i in range(len(ext)):
            hs = hol.iloc[i]
            holes = [] if hs is None else [_to_np(h) for h in hs]
            p = interior_point(_to_np(ext.iloc[i]), holes)
            xs.append(None if p is None else p[0])
            ys.append(None if p is None else p[1])
        return pd.DataFrame({"x": xs, "y": ys})

    return udf(exterior, interiors)


def voronoi_of_group(
    df: DataFrame,
    group_col: str = "group_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str | None = None,
) -> DataFrame:
    """Per-group Voronoi cells: one output row per input site with its cell.

    ``id_col`` (optional, long) is passed through so each cell stays joined
    to its site's identifier."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from geo_spark.kernels.triangulate import voronoi_cells

        pts = pdf[[lon_col, lat_col]].to_numpy(dtype=np.float64)
        cells = voronoi_cells(pts)
        out = {group_col: pdf[group_col].to_numpy()}
        if id_col is not None:
            out[id_col] = pdf[id_col].to_numpy()
        out[lon_col] = pts[:, 0]
        out[lat_col] = pts[:, 1]
        out["cell_ring"] = [_to_rows(c) for c in cells]
        return pd.DataFrame(out)

    id_part = f"{id_col} long, " if id_col is not None else ""
    schema = (
        f"{group_col} long, {id_part}{lon_col} double, {lat_col} double, "
        "cell_ring array<struct<x:double,y:double>>"
    )
    return df.groupBy(group_col).applyInPandas(fn, schema=schema)


def unary_union_rings(rings: Column) -> Column:
    """struct<n_pieces,area>: union of an array-of-exterior-rings column.

    Per-row n-way union (kernels/boolops.unary_union — the reference's
    ``unary_union``, bool_ops/mod.rs:259): pieces after merging + total area.
    """
    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.boolops import unary_union

    @F.pandas_udf("struct<n_pieces:int,area:double>")
    def udf(arrs: pd.Series) -> pd.DataFrame:
        ns, areas = [], []
        for rings_row in arrs:
            if rings_row is None:
                rings_row = []
            polys = [(_to_np(r), []) for r in rings_row]
            merged = unary_union(polys)
            total = 0.0
            for ext, holes in merged:
                total += abs(ring_signed_area(np.asarray(ext, dtype=np.float64)))
                for h in holes:
                    total -= abs(ring_signed_area(np.asarray(h, dtype=np.float64)))
            ns.append(len(merged))
            areas.append(total)
        return pd.DataFrame({"n_pieces": ns, "area": areas})

    return udf(rings)


def delaunay_stitch_stats(coords: Column) -> Column:
    """struct<n_tri,n_pieces,area>: Delaunay-triangulate a point-set column,
    stitch the triangles back (kernels/stitch.py), return triangle count,
    stitched piece count and stitched area.

    Parity: TriangulateDelaunay (delaunay triangle set) + StitchTriangles
    (stitch.rs:25 — union of edge-adjacent triangles).
    """
    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.stitch import stitch_triangles
    from geo_spark.kernels.triangulate import delaunay

    @F.pandas_udf("struct<n_tri:int,n_pieces:int,area:double>")
    def udf(arrs: pd.Series) -> pd.DataFrame:
        nt, npc, area = [], [], []
        for arr in arrs:
            pts = _to_np(arr)
            tris = delaunay(pts)
            stitched = stitch_triangles([pts[list(t)] for t in tris])
            total = 0.0
            for ext, holes in stitched:
                total += abs(ring_signed_area(np.asarray(ext, dtype=np.float64)))
                for h in holes:
                    total -= abs(ring_signed_area(np.asarray(h, dtype=np.float64)))
            nt.append(len(tris))
            npc.append(len(stitched))
            area.append(total)
        return pd.DataFrame({"n_tri": nt, "n_pieces": npc, "area": area})

    return udf(coords)


def buffer_polygon_stats(
    exterior: Column,
    interiors: Column,
    r: float,
    join: str = "round",
    quad_segs: int = 8,
    mitre_limit: float = 5.0,
) -> Column:
    """struct<n_pieces,area>: buffer (dilate r>0 / erode r<0) of a polygon
    column with the requested LineJoin style (buffer.rs:14-23,59 —
    round/mitre/bevel)."""
    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.buffer import buffer_polygon

    @F.pandas_udf("struct<n_pieces:int,area:double>")
    def udf(exts: pd.Series, ints: pd.Series) -> pd.DataFrame:
        ns, areas = [], []
        for i in range(len(exts)):
            holes = ints.iloc[i]
            holes = [] if holes is None else [_to_np(h) for h in holes]
            out = buffer_polygon(
                _to_np(exts.iloc[i]), holes, r, quad_segs, join, mitre_limit
            )
            total = 0.0
            for ext, hs in out:
                total += abs(ring_signed_area(np.asarray(ext, dtype=np.float64)))
                for h in hs:
                    total -= abs(ring_signed_area(np.asarray(h, dtype=np.float64)))
            ns.append(len(out))
            areas.append(total)
        return pd.DataFrame({"n_pieces": ns, "area": areas})

    return udf(exterior, interiors)
