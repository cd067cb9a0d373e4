"""Convex hull: QuickHull with exact vertex-sequence parity.

Reimplements the *behavior* of the reference's QuickHull
(``geo/src/algorithm/convex_hull/qhull.rs:41-193``, Barber-Dobkin-Huhdanpaa
1996) so that the output vertex sequence matches the reference's unit tests
(``qhull.rs:196-312``) and WKT goldens (poly1_hull / poly2_hull) exactly:

- pivots are the lexicographic (x, then y) min and max (``least_and_greatest_index``);
- the working buffer is mutated by swap-with-first-and-remove and a
  two-pointer in-place partition (``utils.rs:13-33``); recursion operates on
  index ranges of ONE shared buffer so reorderings propagate exactly as the
  Rust slice mutations do (this fixes tie-breaking order);
- the farthest-point scan keeps the *last* maximum on ties (Rust
  ``Iterator::max_by`` semantics);
- output is CCW, starts after the lexicographic max side, and is closed;
- < 4 input coords take the trivial path (sort, drop middle of a collinear
  triple, enforce CCW — ``convex_hull/mod.rs:84-117``).

Orientation tests use the robust two-stage ``orient2d``.
"""

from __future__ import annotations

import sys

import numpy as np

from geo_spark.kernels.area import ring_is_ccw
from geo_spark.kernels.predicates import orient2d


def trivial_hull(points: np.ndarray) -> np.ndarray:
    """Hull of < 4 coords: lex-sort, drop middle of collinear triple, CCW, closed."""
    pts = [tuple(p) for p in np.asarray(points, dtype=np.float64)]
    assert len(pts) < 4
    pts.sort()
    if len(pts) == 3 and orient2d(
        pts[0][0], pts[0][1], pts[1][0], pts[1][1], pts[2][0], pts[2][1]
    ) == 0:
        del pts[1]
    if len(pts) == 1:
        pts.append(pts[0])
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    ring = np.asarray(pts, dtype=np.float64)
    if len(ring) >= 4 and not ring_is_ccw(ring):
        ring = ring[::-1].copy()
    return ring


def _is_ccw(a, b, c) -> bool:
    return int(orient2d(a[0], a[1], b[0], b[1], c[0], c[1])) > 0


def _partition(buf: list, lo: int, hi: int, pred) -> int:
    """Two-pointer in-place partition over ``buf[lo:hi)`` — identical element
    movement to the reference's ``partition_slice``. Returns the absolute
    split index (start of the false side)."""
    ln = hi - lo
    if ln == 0:
        return lo
    mask = [pred(buf[i][1]) for i in range(lo, hi)]
    l, r = 0, ln - 1
    while True:
        while l < ln and mask[l]:
            l += 1
        while r > 0 and not mask[r]:
            r -= 1
        if l >= r:
            return lo + l
        buf[lo + l], buf[lo + r] = buf[lo + r], buf[lo + l]
        mask[l], mask[r] = mask[r], mask[l]


def _hull_set(p_a, p_b, lo: int, hi: int, buf: list, hull: list) -> None:
    """Recursive farthest-point step over ``buf[lo:hi)`` (points CCW of a→b)."""
    n = hi - lo
    if n == 0:
        return
    if n == 1:
        hull.append(buf[lo])
        return
    ax, ay = p_a
    orth_x = ay - p_b[1]
    orth_y = p_b[0] - ax
    coords = np.asarray([buf[i][1] for i in range(lo, hi)], dtype=np.float64)
    dots = orth_x * (coords[:, 0] - ax) + orth_y * (coords[:, 1] - ay)
    # last max wins on ties (Rust Iterator::max_by keeps the last maximum)
    furthest_rel = len(dots) - 1 - int(np.argmax(dots[::-1]))
    buf[lo], buf[lo + furthest_rel] = buf[lo + furthest_rel], buf[lo]
    furthest = buf[lo]
    fp = furthest[1]
    lo2 = lo + 1
    split = _partition(buf, lo2, hi, lambda c: _is_ccw(fp, p_b, c))
    _hull_set(fp, p_b, lo2, split, buf, hull)
    hull.append(furthest)
    split = _partition(buf, lo2, hi, lambda c: _is_ccw(p_a, fp, c))
    _hull_set(p_a, fp, lo2, split, buf, hull)


def quick_hull(points: np.ndarray, return_indices: bool = False):
    """Convex hull of a point set; closed CCW ring as an (h, 2) array.

    With ``return_indices=True`` also returns the input indices of the hull
    vertices (closed), mirroring ``quick_hull_indices`` (``qhull.rs:56-84``).
    """
    pts_arr = np.asarray(points, dtype=np.float64)
    n = len(pts_arr)
    if n < 4:
        ring = trivial_hull(pts_arr)
        if not return_indices:
            return ring
        idx = []
        for hc in ring:
            for i in range(n):
                if pts_arr[i, 0] == hc[0] and pts_arr[i, 1] == hc[1]:
                    idx.append(i)
                    break
        return ring, idx

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10_000))
    try:
        buf = [(i, (float(pts_arr[i, 0]), float(pts_arr[i, 1]))) for i in range(n)]
        min_i, max_i = 0, 0
        for i in range(1, n):
            c = buf[i][1]
            if c < buf[min_i][1]:
                min_i = i
            if c > buf[max_i][1]:
                max_i = i
        # swap_with_first_and_remove(min), then the reference's max_idx fixups
        buf[0], buf[min_i] = buf[min_i], buf[0]
        p_min = buf[0]
        lo = 1
        if max_i == 0:
            max_i = min_i
        max_i = max(max_i - 1, 0)
        buf[lo], buf[lo + max_i] = buf[lo + max_i], buf[lo]
        p_max = buf[lo]
        lo += 1

        hull: list = []
        mn, mx = p_min[1], p_max[1]
        split = _partition(buf, lo, n, lambda c: _is_ccw(mx, mn, c))
        _hull_set(mx, mn, lo, split, buf, hull)
        hull.append(p_max)
        split = _partition(buf, lo, n, lambda c: _is_ccw(mn, mx, c))
        _hull_set(mn, mx, lo, split, buf, hull)
        hull.append(p_min)
    finally:
        sys.setrecursionlimit(old_limit)

    indices = [h[0] for h in hull]
    ring = np.asarray([h[1] for h in hull], dtype=np.float64)
    if len(ring) > 0 and (ring[0] != ring[-1]).any():
        ring = np.vstack([ring, ring[:1]])
        indices.append(indices[0])
    return (ring, indices) if return_indices else ring
