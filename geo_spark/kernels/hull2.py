"""Concave hulls.

- ``concave_hull``: concaveman-style edge digging (the reference's
  ``concave_hull.rs:104`` ports mapbox/concaveman; same idea here — start
  from the quickhull convex hull, repeatedly split hull edges toward the
  nearest interior point when the local concavity decision allows, guarded
  by segment-intersection checks). Parameters match: ``concavity`` (relative,
  higher → more convex) and ``length_threshold``.
- ``k_nearest_concave_hull``: Moreira-Santos gift-wrapping over k nearest
  neighbors (``k_nearest_concave_hull.rs:36`` lineage): walk from the lowest
  point choosing the largest right-hand turn among the k nearest unused
  points, rejecting self-intersections, growing k on failure.

Both return closed rings covering every input point (asserted in tests).
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernels.hull import quick_hull
from geo_spark.kernels.predicates import ring_position, segments_intersect


def _seg_point_dist(px, py, ax, ay, bx, by):
    from geo_spark.kernels.measures import point_segment_distance

    return point_segment_distance(px, py, ax, ay, bx, by)


def concave_hull(
    points: np.ndarray,
    concavity: float = 2.0,
    length_threshold: float = 0.0,
    max_iter: int = 10_000,
) -> np.ndarray:
    """Concave hull ring (closed). Concavity → ∞ reproduces the convex hull."""
    pts = np.asarray(points, dtype=np.float64)
    pts = np.unique(pts, axis=0)
    if len(pts) < 4:
        return quick_hull(pts)
    hull = quick_hull(pts)  # closed CCW
    ring = [tuple(p) for p in hull[:-1]]
    hull_set = set(ring)
    interior_mask = np.array([tuple(p) not in hull_set for p in pts])
    interior = pts[interior_mask]

    def intersects_ring(a, b, skip_i):
        n = len(ring)
        for i in range(n):
            if i == skip_i:
                continue
            c = ring[i]
            d = ring[(i + 1) % n]
            if c == a or c == b or d == a or d == b:
                continue
            if segments_intersect(a[0], a[1], b[0], b[1], c[0], c[1], d[0], d[1])[()]:
                return True
        return False

    used = np.zeros(len(interior), dtype=bool)
    changed = True
    iters = 0
    while changed and iters < max_iter:
        changed = False
        i = 0
        while i < len(ring):
            iters += 1
            a = ring[i]
            b = ring[(i + 1) % len(ring)]
            edge_len = float(np.hypot(b[0] - a[0], b[1] - a[1]))
            if edge_len <= length_threshold:
                i += 1
                continue
            cand_idx = np.flatnonzero(~used)
            if len(cand_idx) == 0:
                break
            cand = interior[cand_idx]
            d = _seg_point_dist(cand[:, 0], cand[:, 1], a[0], a[1], b[0], b[1])
            j = int(np.argmin(d))
            dist = float(d[j])
            # concaveman decision: dig when dist * concavity < edge length
            if dist * concavity < edge_len:
                p = tuple(interior[cand_idx[j]])
                if not intersects_ring(a, p, i) and not intersects_ring(p, b, i):
                    ring.insert(i + 1, p)
                    used[cand_idx[j]] = True
                    changed = True
                    continue  # retry the (a, p) edge
                # blocked by an intersection: leave the candidate available
                # (another edge may legally dig toward it) and move on
            i += 1
    out = np.asarray(ring + [ring[0]], dtype=np.float64)
    return out


def k_nearest_concave_hull(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Moreira-Santos kNN concave hull; closed ring containing all points."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n < 4:
        return quick_hull(pts)
    k = max(3, min(k, n - 1))

    while k < n:
        ring = _ms_hull_attempt(pts, k)
        if ring is not None:
            return ring
        k += 1
    return quick_hull(pts)


def _ms_hull_attempt(pts: np.ndarray, k: int):
    n = len(pts)
    start = int(np.lexsort((pts[:, 0], pts[:, 1]))[0])  # lowest y, then x
    used = np.zeros(n, dtype=bool)
    ring = [start]
    used[start] = True
    cur = start
    prev_angle = 0.0  # heading of the previous step (radians)
    for _ in range(n * 4):
        cand = np.flatnonzero(~used)
        if len(ring) > 3:
            cand = np.append(cand, start)  # allow closing
        if len(cand) == 0:
            return None
        d = np.hypot(pts[cand, 0] - pts[cur, 0], pts[cand, 1] - pts[cur, 1])
        order = np.argsort(d, kind="mergesort")
        nearest = cand[order[: k + 1]]
        nearest = nearest[nearest != cur][:k]
        # choose largest clockwise turn from the previous heading
        angles = np.arctan2(pts[nearest, 1] - pts[cur, 1], pts[nearest, 0] - pts[cur, 0])
        rel = (prev_angle - angles + np.pi) % (2 * np.pi)
        for j in nearest[np.argsort(-rel, kind="mergesort")]:
            a = tuple(pts[cur])
            b = tuple(pts[j])
            ok = True
            for t in range(len(ring) - 2):
                c = tuple(pts[ring[t]])
                dpt = tuple(pts[ring[t + 1]])
                if c == a or dpt == a or c == b or dpt == b:
                    continue
                if segments_intersect(a[0], a[1], b[0], b[1], c[0], c[1], dpt[0], dpt[1])[()]:
                    ok = False
                    break
            if not ok:
                continue
            if j == start:
                ring.append(start)
                out = pts[ring]
                inside = ring_position(pts[:, 0], pts[:, 1], out)
                if (inside >= 0).all():
                    return out
                return None
            prev_angle = float(
                np.arctan2(pts[cur, 1] - pts[j, 1], pts[cur, 0] - pts[j, 0])
            )
            ring.append(int(j))
            used[j] = True
            cur = int(j)
            break
        else:
            return None
    return None
