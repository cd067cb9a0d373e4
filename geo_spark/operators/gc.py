"""GeometryCollection as a first-class Spark column.

The tagged-GC representation mirrors the reference's geometry enum
(``geo-types/src/geometry/mod.rs:50`` — a collection of tagged members) as a
plain Spark type, so GCs flow through DataFrame ops, parquet, and shuffles
without a UDT:

    GC_TYPE = array<struct<kind:string, rings:array<array<struct<x,y>>>>>

kind ∈ 'point' | 'linestring' | 'polygon';
  point      → rings = [[{x,y}]]
  linestring → rings = [coords]
  polygon    → rings = [exterior, hole, ...]   (closed rings)

Column ops (vectorized pandas UDFs over Arrow batches):
  - ``gc_centroid``: dimension-phase centroid (``centroid.rs:36`` /
    JTS Centroid — the rule certified by the conformance corpus via
    kernels/area.centroid_phases).
  - ``gc_is_valid``: polygon members pass the full validation kernel
    (``validation/mod.rs`` rules — geom2.validate_polygon), linestrings need
    two distinct points, points need finite coords.
  - ``gc_dimension``: max member dimension (HasDimensions — empty → -1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

COORD = T.StructType(
    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
)
GC_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("rings", T.ArrayType(T.ArrayType(COORD))),
        ]
    )
)


def _member_components(members):
    """Flatten one GC cell into (pts, lines, polys) numpy components."""
    pts, lines, polys = [], [], []
    if members is None:
        members = []
    for m in members:
        kind = (m["kind"] or "").lower()
        raw = m["rings"]
        rings = [
            np.asarray([(c["x"], c["y"]) for c in ring], dtype=np.float64)
            for ring in (raw if raw is not None else [])
        ]
        if kind == "empty":  # sentinel for the empty collection (_nonempty)
            continue
        if kind == "point":
            for ring in rings:
                for x, y in ring:
                    pts.append((float(x), float(y)))
        elif kind == "linestring":
            for ring in rings:
                if len(ring):
                    lines.append(ring)
        elif kind == "polygon":
            if rings:
                polys.append((rings[0], rings[1:]))
        else:
            raise ValueError(f"unknown GC member kind: {kind}")
    return pts, lines, polys


def _nonempty(gc: Column) -> Column:
    """Empty member arrays → a one-member 'empty' sentinel before the Arrow
    transfer: this environment's Spark→pandas serializer segfaults when a
    batch holds ONLY empty/null cells of the deeply-nested GC type
    (array<struct<string,array<array<struct>>>>). The sentinel keeps every
    list non-empty; ``_member_components`` skips the 'empty' kind, so the
    UDFs still see the empty collection."""
    sentinel = F.struct(
        F.lit("empty").alias("kind"),
        F.array(
            F.array(F.struct(F.lit(0.0).alias("x"), F.lit(0.0).alias("y")))
        ).alias("rings"),
    )
    return F.when(F.size(gc) > 0, gc).otherwise(F.array(sentinel))


def gc_centroid(gc: Column) -> Column:
    """struct<x,y> — dimension-phase centroid of a tagged-GC column."""
    from geo_spark.kernels.area import centroid_phases

    @F.pandas_udf("struct<x:double,y:double>")
    def udf(cells: pd.Series) -> pd.DataFrame:
        xs, ys = [], []
        for members in cells:
            c = centroid_phases(*_member_components(members))
            xs.append(None if c is None else c[0])
            ys.append(None if c is None else c[1])
        return pd.DataFrame({"x": xs, "y": ys})

    res = udf(_nonempty(gc))
    # struct-of-nulls → NULL struct (the empty collection has no centroid).
    # Referencing `res` twice does NOT re-run the UDF: ExtractPythonUDFs
    # dedups the equal PythonUDF subtrees into one ArrowEvalPython attribute
    # (verified on this Spark: plan shows a single pythonUDF0, and an
    # accumulator in the UDF counts exactly one batch per partition).
    return F.when(res["x"].isNotNull(), res)


def gc_is_valid(gc: Column) -> Column:
    """boolean — every member passes its type's validation rules."""
    from geo_spark.kernels.geom2 import validate_polygon

    @F.pandas_udf(T.BooleanType())
    def udf(cells: pd.Series) -> pd.Series:
        out = []
        for members in cells:
            ok = True
            pts, lines, polys = _member_components(members)
            for x, y in pts:
                if not (np.isfinite(x) and np.isfinite(y)):
                    ok = False
            for line in lines:
                if len(np.unique(line, axis=0)) < 2:
                    ok = False
            for ext, holes in polys:
                if validate_polygon(ext, holes):
                    ok = False
            out.append(ok)
        return pd.Series(out, dtype="boolean")

    return udf(_nonempty(gc))


def gc_dimension(gc: Column) -> Column:
    """int — max member dimension: 2 polygon, 1 line, 0 point, -1 empty.
    Pure SQL (JVM-side), no Python."""
    has = lambda k: F.exists(gc, lambda m: F.lower(m["kind"]) == k)  # noqa: E731
    return (
        F.when(has("polygon"), F.lit(2))
        .when(has("linestring"), F.lit(1))
        .when(has("point"), F.lit(0))
        .otherwise(F.lit(-1))
    )


def _components_to_members(pts, segs, polys):
    """(pts, segs, polys) from the mixed overlay → tagged-GC member list."""
    members = []
    for ext, holes in polys:
        rings = [np.asarray(ext, dtype=np.float64)] + [
            np.asarray(h, dtype=np.float64) for h in holes
        ]
        members.append(
            {
                "kind": "polygon",
                "rings": [
                    [{"x": float(x), "y": float(y)} for x, y in r] for r in rings
                ],
            }
        )
    for a, b in segs:
        members.append(
            {
                "kind": "linestring",
                "rings": [[
                    {"x": float(a[0]), "y": float(a[1])},
                    {"x": float(b[0]), "y": float(b[1])},
                ]],
            }
        )
    for x, y in sorted(pts):
        members.append(
            {"kind": "point", "rings": [[{"x": float(x), "y": float(y)}]]}
        )
    return members


def _members_to_geom(members):
    """Tagged-GC cell → (kind, data) geometry for the overlay kernel."""
    parts = []
    if members is None:
        members = []
    for m in members:
        kind = (m["kind"] or "").lower()
        raw = m["rings"]
        rings = [
            np.asarray([(c["x"], c["y"]) for c in ring], dtype=np.float64)
            for ring in (raw if raw is not None else [])
        ]
        if kind == "empty":
            continue
        if kind == "point":
            for ring in rings:
                for x, y in ring:
                    parts.append(("Point", np.asarray([x, y], dtype=np.float64)))
        elif kind == "linestring":
            for ring in rings:
                if len(ring):
                    parts.append(("LineString", ring))
        elif kind == "polygon":
            if rings:
                parts.append(("Polygon", rings))
        else:
            raise ValueError(f"unknown GC member kind: {kind}")
    return ("GeometryCollection", parts)


def gc_overlay(gc_a: Column, gc_b: Column, op: str) -> Column:
    """Heterogeneous overlay of two tagged-GC columns → tagged-GC column.

    The engine's GeometryCollection-capable boolean op as a first-class
    column operator (kernels/overlay_mixed.mixed_overlay — the JTS
    OverlayNG result shape: area pieces + collapsed/touch lines + isolated
    points, lower-dimensional redundancy absorbed). op ∈ 'intersection' |
    'union' | 'difference' | 'symdifference'. Conformance-certified: the
    same kernel evaluates ~670 JTS mixed-dimension corpus cases.
    """

    @F.pandas_udf(GC_TYPE)
    def udf(ca: pd.Series, cb: pd.Series) -> pd.Series:
        from geo_spark.kernels.overlay_mixed import mixed_overlay

        out = []
        for i in range(len(ca)):
            ga = _members_to_geom(ca.iloc[i])
            gb = _members_to_geom(cb.iloc[i])
            pts, segs, polys = mixed_overlay(ga, gb, op)
            out.append(_components_to_members(pts, segs, polys))
        return pd.Series(out)

    res = udf(_nonempty(gc_a), _nonempty(gc_b))
    # empty result list → sentinel-free empty GC stays an empty array
    return res
