"""DE-9IM relate (point cases) + compound intersects predicates.

The reference's full ``Relate`` runs a JTS-lineage geometry graph
(``relate/relate_operation.rs``, ~3.5k LoC); the engine's primary data shape
is points-vs-polygons, for which the DE-9IM matrix is a direct function of
the ternary position — implemented exactly here. Matrix strings follow
``relate/geomgraph/intersection_matrix.rs`` conventions ('0'/'1'/'2'
dimension of intersection, 'F' empty), and ``de9im_matches`` implements the
pattern language ('T' = any non-F, '*' = anything) of
``intersection_matrix.rs:799``.

Compound ``Intersects`` (linestring×linestring, linestring×polygon,
polygon×polygon) mirrors ``intersects/polygon.rs:36-103``: bbox fast-reject,
segment-crossing tests, then one-point containment for the
fully-inside cases.
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernels.predicates import (
    polygon_position,
    ring_position,
    segments_intersect,
)


def relate_point_polygon(px: float, py: float, exterior, interiors=()) -> str:
    """DE-9IM matrix string for (Point A, Polygon B)."""
    pos = int(polygon_position([px], [py], exterior, interiors)[0])
    if pos == 1:
        return "0FFFFF212"
    if pos == 0:
        return "F0FFFF212"
    return "FF0FFF212"


def relate_point_point(ax: float, ay: float, bx: float, by: float) -> str:
    if ax == bx and ay == by:
        return "0FFFFFFF2"
    return "FF0FFF0F2"


def relate_point_linestring(px: float, py: float, coords) -> str:
    """DE-9IM for (Point A, LineString B); B's boundary = its endpoints."""
    coords = np.asarray(coords, dtype=np.float64)
    closed = len(coords) >= 2 and (coords[0] == coords[-1]).all()
    on_endpoint = (not closed) and (
        (px == coords[0, 0] and py == coords[0, 1])
        or (px == coords[-1, 0] and py == coords[-1, 1])
    )
    s, e = coords[:-1], coords[1:]
    on_line = bool(
        segments_intersect(
            np.full(len(s), px), np.full(len(s), py),
            np.full(len(s), px), np.full(len(s), py),
            s[:, 0], s[:, 1], e[:, 0], e[:, 1],
        ).any()
    )
    b_boundary = "F" if closed else "0"
    if on_endpoint:
        return "F0FFFF1" + ("F" if closed else "0") + "2"
    if on_line:
        return "0FFFFF1" + b_boundary + "2"
    return "FF0FFF1" + b_boundary + "2"


def de9im_matches(matrix: str, pattern: str) -> bool:
    """Pattern match: 'T' any dim, 'F' empty, '*' anything, '0'/'1'/'2' exact."""
    if len(matrix) != 9 or len(pattern) != 9:
        raise ValueError("matrix and pattern must be 9 chars")
    for m, p in zip(matrix, pattern):
        if p == "*":
            continue
        if p == "T":
            if m == "F":
                return False
        elif m != p:
            return False
    return True


def is_contains(matrix: str) -> bool:
    """``intersection_matrix.rs:436``: T*****FF*."""
    return de9im_matches(matrix, "T*****FF*")


def is_within(matrix: str) -> bool:
    return de9im_matches(matrix, "T*F**F***")


def is_intersects(matrix: str) -> bool:
    return not de9im_matches(matrix, "FF*FF****")


def is_touches(matrix: str) -> bool:
    return (
        de9im_matches(matrix, "FT*******")
        or de9im_matches(matrix, "F**T*****")
        or de9im_matches(matrix, "F***T****")
    )


def is_covers(matrix: str) -> bool:
    return (
        de9im_matches(matrix, "T*****FF*")
        or de9im_matches(matrix, "*T****FF*")
        or de9im_matches(matrix, "***T**FF*")
        or de9im_matches(matrix, "****T*FF*")
    )


# --- compound intersects -------------------------------------------------------

def _segments(coords: np.ndarray):
    coords = np.asarray(coords, dtype=np.float64)
    return coords[:-1], coords[1:]


def _any_segment_cross(a: np.ndarray, b: np.ndarray) -> bool:
    sa, ea = _segments(a)
    sb, eb = _segments(b)
    if len(sa) == 0 or len(sb) == 0:
        return False
    # vectorize over the pair grid in chunks
    for i in range(len(sa)):
        hit = segments_intersect(
            np.full(len(sb), sa[i, 0]), np.full(len(sb), sa[i, 1]),
            np.full(len(sb), ea[i, 0]), np.full(len(sb), ea[i, 1]),
            sb[:, 0], sb[:, 1], eb[:, 0], eb[:, 1],
        )
        if hit.any():
            return True
    return False


def linestrings_intersect(a, b) -> bool:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if len(a) < 2 or len(b) < 2:
        return False
    if (
        a[:, 0].max() < b[:, 0].min() or a[:, 0].min() > b[:, 0].max()
        or a[:, 1].max() < b[:, 1].min() or a[:, 1].min() > b[:, 1].max()
    ):
        return False
    return _any_segment_cross(a, b)


def linestring_intersects_polygon(line, exterior, interiors=()) -> bool:
    line = np.asarray(line, dtype=np.float64)
    if len(line) == 0:
        return False
    # any vertex inside-or-on → intersects
    pos = polygon_position(line[:, 0], line[:, 1], exterior, interiors)
    if (pos >= 0).any():
        return True
    # else any edge crossing with any ring
    rings = [np.asarray(exterior, dtype=np.float64)] + [
        np.asarray(h, dtype=np.float64) for h in interiors
    ]
    return any(_any_segment_cross(line, r) for r in rings)


def polygons_intersect(ext_a, holes_a, ext_b, holes_b) -> bool:
    """``intersects/polygon.rs:36-83``: one-point containment either way, or
    any cross-ring segment crossing."""
    ext_a = np.asarray(ext_a, dtype=np.float64)
    ext_b = np.asarray(ext_b, dtype=np.float64)
    if (
        ext_a[:, 0].max() < ext_b[:, 0].min() or ext_a[:, 0].min() > ext_b[:, 0].max()
        or ext_a[:, 1].max() < ext_b[:, 1].min() or ext_a[:, 1].min() > ext_b[:, 1].max()
    ):
        return False
    if polygon_position(ext_b[:1, 0], ext_b[:1, 1], ext_a, holes_a)[0] >= 0:
        return True
    if polygon_position(ext_a[:1, 0], ext_a[:1, 1], ext_b, holes_b)[0] >= 0:
        return True
    rings_a = [ext_a] + [np.asarray(h, dtype=np.float64) for h in holes_a]
    rings_b = [ext_b] + [np.asarray(h, dtype=np.float64) for h in holes_b]
    return any(_any_segment_cross(ra, rb) for ra in rings_a for rb in rings_b)
