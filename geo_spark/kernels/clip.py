"""Sutherland–Hodgman clipping of polygons against axis-aligned rectangles.

This is the engine's raster↔vector tile-clip primitive (the north-star names
it explicitly). The reference delegates general boolean overlay to the
``i_overlay`` crate (``geo/src/algorithm/bool_ops/mod.rs:91-107``); for the
tile path — clip windows are axis-aligned rects, i.e. convex — the classical
Sutherland–Hodgman algorithm computes the same intersection polygon, which is
what we implement here in numpy. Expected results are anchored to the
reference's own doctest shapes (two overlapping squares → intersection square,
``bool_ops/mod.rs:86-90``) and to ``RectOps`` AABB math (``rect_ops.rs:5``).

Degenerate outputs (clip collapses to an edge/point) return an empty ring.
"""

from __future__ import annotations

import numpy as np


def _open_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and ring[0, 0] == ring[-1, 0] and ring[0, 1] == ring[-1, 1]:
        ring = ring[:-1]
    return ring


def _clip_half_plane(pts: np.ndarray, inside_mask_fn, intersect_fn) -> np.ndarray:
    """One Sutherland–Hodgman pass against a single half-plane."""
    n = len(pts)
    if n == 0:
        return pts
    inside = inside_mask_fn(pts)
    out = []
    for i in range(n):
        j = (i + 1) % n
        p, q = pts[i], pts[j]
        if inside[i]:
            out.append(p)
            if not inside[j]:
                out.append(intersect_fn(p, q))
        elif inside[j]:
            out.append(intersect_fn(p, q))
    if not out:
        return np.empty((0, 2), dtype=np.float64)
    return np.asarray(out, dtype=np.float64)


def clip_ring_to_rect(ring, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    """Clip one ring to an axis-aligned rect; returns a closed ring (or empty).

    The four half-plane passes use exact interpolation along the clipped
    edge; points exactly on the rect boundary are kept (boundary-inclusive,
    matching ``BooleanOps::intersection`` which includes boundaries).
    """
    pts = _open_ring(ring)
    if len(pts) < 3:
        return np.empty((0, 2), dtype=np.float64)

    def x_at(p, q, x):
        t = (x - p[0]) / (q[0] - p[0])
        return np.array([x, p[1] + t * (q[1] - p[1])])

    def y_at(p, q, y):
        t = (y - p[1]) / (q[1] - p[1])
        return np.array([p[0] + t * (q[0] - p[0]), y])

    passes = [
        (lambda a: a[:, 0] >= xmin, lambda p, q: x_at(p, q, xmin)),
        (lambda a: a[:, 0] <= xmax, lambda p, q: x_at(p, q, xmax)),
        (lambda a: a[:, 1] >= ymin, lambda p, q: y_at(p, q, ymin)),
        (lambda a: a[:, 1] <= ymax, lambda p, q: y_at(p, q, ymax)),
    ]
    for mask_fn, isect_fn in passes:
        pts = _clip_half_plane(pts, mask_fn, isect_fn)
        if len(pts) < 3:
            return np.empty((0, 2), dtype=np.float64)
    # dedup consecutive duplicates introduced by on-boundary vertices
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    pts = pts[keep]
    if len(pts) >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    if len(pts) < 3:
        return np.empty((0, 2), dtype=np.float64)
    return np.vstack([pts, pts[:1]])


def rect_clip_area(ring, xmin, ymin, xmax, ymax) -> float:
    """Unsigned area of ring ∩ rect (shoelace over the clipped ring)."""
    from geo_spark.kernels.area import ring_signed_area

    clipped = clip_ring_to_rect(ring, xmin, ymin, xmax, ymax)
    if len(clipped) == 0:
        return 0.0
    return abs(ring_signed_area(clipped))


def rect_intersection(a, b) -> tuple[float, float, float, float] | None:
    """AABB ∩ AABB (``rect_ops.rs`` semantics); None when disjoint."""
    xmin = max(a[0], b[0])
    ymin = max(a[1], b[1])
    xmax = min(a[2], b[2])
    ymax = min(a[3], b[3])
    if xmin > xmax or ymin > ymax:
        return None
    return (xmin, ymin, xmax, ymax)


def rect_union_bounds(a, b) -> tuple[float, float, float, float]:
    """Smallest AABB covering both."""
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))
