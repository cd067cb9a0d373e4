"""Line-geometry kernels: intersection, interpolation, measures along lines.

Behavior parity targets (reference files):

- ``line_intersection`` (``line_intersection.rs:76-220``, JTS
  RobustLineIntersector lineage): bbox fast-reject, robust orientation
  gates, endpoint-snap for improper intersections, collinear overlap
  segments;
- ``LineInterpolatePoint`` / ``LineLocatePoint`` / ``Substring``
  (``line_interpolate_point.rs:41``, ``line_locate_point.rs:38``,
  ``line_measures/substring.rs:46``);
- ``Densify`` (``line_measures/densify.rs:60``): insert vertices so no
  segment exceeds max_segment_length — ceil-split per segment;
- ``FrechetDistance`` (``line_measures/frechet_distance.rs:13``):
  discrete Fréchet via linear-memory DP;
- ``HausdorffDistance`` (``hausdorff_distance.rs:14``): max of directed
  coordinate-wise min distances;
- ``ClosestPoint`` (``closest_point.rs:27``): nearest point on a geometry,
  with Intersection/SinglePoint result kinds;
- ``IsConvex`` (``is_convex.rs:45``): orientation scan of a closed ring.
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernels.measures import euclidean_distance, point_segment_distance
from geo_spark.kernels.predicates import orient2d


# --- segment intersection ---------------------------------------------------

def line_intersection(p0, p1, q0, q1):
    """Intersection of segments (p0,p1) and (q0,q1).

    Returns None, ('point', (x, y), is_proper), or ('collinear', (a, b))
    with a/b the overlap endpoints — mirroring LineIntersection's variants.
    """
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    q0 = np.asarray(q0, dtype=np.float64)
    q1 = np.asarray(q1, dtype=np.float64)
    # bbox fast reject
    if (
        max(p0[0], p1[0]) < min(q0[0], q1[0])
        or min(p0[0], p1[0]) > max(q0[0], q1[0])
        or max(p0[1], p1[1]) < min(q0[1], q1[1])
        or min(p0[1], p1[1]) > max(q0[1], q1[1])
    ):
        return None

    def o(a, b, c):
        return int(orient2d(a[0], a[1], b[0], b[1], c[0], c[1]))

    p_q1 = o(p0, p1, q0)
    p_q2 = o(p0, p1, q1)
    if (p_q1 > 0 and p_q2 > 0) or (p_q1 < 0 and p_q2 < 0):
        return None
    q_p1 = o(q0, q1, p0)
    q_p2 = o(q0, q1, p1)
    if (q_p1 > 0 and q_p2 > 0) or (q_p1 < 0 and q_p2 < 0):
        return None

    if p_q1 == 0 and p_q2 == 0 and q_p1 == 0 and q_p2 == 0:
        return _collinear_intersection(p0, p1, q0, q1)

    if p_q1 == 0 or p_q2 == 0 or q_p1 == 0 or q_p2 == 0:
        # improper: snap to the shared/incident endpoint (exact copy)
        if (p0 == q0).all() or (p0 == q1).all():
            pt = p0
        elif (p1 == q0).all() or (p1 == q1).all():
            pt = p1
        elif p_q1 == 0:
            pt = q0
        elif p_q2 == 0:
            pt = q1
        elif q_p1 == 0:
            pt = p0
        else:
            pt = p1
        return ("point", (float(pt[0]), float(pt[1])), False)

    # proper intersection: parametric solve
    d1 = p1 - p0
    d2 = q1 - q0
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    t = ((q0[0] - p0[0]) * d2[1] - (q0[1] - p0[1]) * d2[0]) / denom
    x = p0[0] + t * d1[0]
    y = p0[1] + t * d1[1]
    return ("point", (float(x), float(y)), True)


def _collinear_intersection(p0, p1, q0, q1):
    # project onto the dominant axis
    axis = 0 if abs(p1[0] - p0[0]) >= abs(p1[1] - p0[1]) else 1
    pts = sorted([tuple(p0), tuple(p1)], key=lambda c: c[axis])
    qts = sorted([tuple(q0), tuple(q1)], key=lambda c: c[axis])
    lo = max(pts[0][axis], qts[0][axis])
    hi = min(pts[1][axis], qts[1][axis])
    if lo > hi:
        return None
    cands = [c for c in [tuple(p0), tuple(p1), tuple(q0), tuple(q1)] if lo <= c[axis] <= hi]
    cands.sort(key=lambda c: c[axis])
    a, b = cands[0], cands[-1]
    if a == b:
        return ("point", (float(a[0]), float(a[1])), False)
    return ("collinear", ((float(a[0]), float(a[1])), (float(b[0]), float(b[1]))))


def sweep_intersections(segments: np.ndarray, include_endpoints: bool = True):
    """All pairwise segment intersections, sorted-by-x candidate pruning.

    The distributed analogue of the reference's simplified Bentley-Ottmann
    (``sweep/mod.rs:11-47``): sort once by min-x, scan with an active window,
    exact pairwise test per candidate pair. ``segments`` is (n, 4) as
    (x0, y0, x1, y1). Returns list of (i, j, result) with i < j.
    """
    segments = np.asarray(segments, dtype=np.float64)
    n = len(segments)
    min_x = np.minimum(segments[:, 0], segments[:, 2])
    max_x = np.maximum(segments[:, 0], segments[:, 2])
    order = np.argsort(min_x, kind="mergesort")
    out = []
    active: list[int] = []
    for oi in order:
        x_start = min_x[oi]
        active = [a for a in active if max_x[a] >= x_start]
        for a in active:
            i, j = (a, oi) if a < oi else (oi, a)
            r = line_intersection(
                segments[i, :2], segments[i, 2:], segments[j, :2], segments[j, 2:]
            )
            if r is not None:
                if not include_endpoints and r[0] == "point" and not r[2]:
                    continue
                out.append((int(i), int(j), r))
        active.append(int(oi))
    return out


# --- interpolation / location along lines ------------------------------------

def _segment_lengths(coords: np.ndarray) -> np.ndarray:
    d = coords[1:] - coords[:-1]
    return np.hypot(d[:, 0], d[:, 1])


def line_interpolate_point(coords: np.ndarray, fraction: float):
    """Point at ``fraction`` of the line's total planar length (clamped)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) == 0:
        return None
    if len(coords) == 1:
        return (float(coords[0, 0]), float(coords[0, 1]))
    if np.isnan(fraction):
        return None
    fraction = min(max(fraction, 0.0), 1.0)
    lengths = _segment_lengths(coords)
    total = float(lengths.sum())
    if total == 0.0:
        return (float(coords[0, 0]), float(coords[0, 1]))
    target = fraction * total
    cum = np.concatenate([[0.0], np.cumsum(lengths)])
    i = int(np.searchsorted(cum, target, side="right") - 1)
    i = min(i, len(lengths) - 1)
    seg_len = lengths[i]
    t = 0.0 if seg_len == 0 else (target - cum[i]) / seg_len
    p = coords[i] + t * (coords[i + 1] - coords[i])
    return (float(p[0]), float(p[1]))


def line_locate_point(coords: np.ndarray, px: float, py: float):
    """Fraction along the line of the closest point to (px, py)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return None
    a = coords[:-1]
    b = coords[1:]
    d = b - a
    seg_len2 = d[:, 0] ** 2 + d[:, 1] ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        t = ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1]) / np.where(
            seg_len2 == 0, 1, seg_len2
        )
    t = np.clip(np.where(seg_len2 == 0, 0.0, t), 0.0, 1.0)
    qx = a[:, 0] + t * d[:, 0]
    qy = a[:, 1] + t * d[:, 1]
    dist = np.hypot(px - qx, py - qy)
    i = int(np.argmin(dist))
    lengths = _segment_lengths(coords)
    total = float(lengths.sum())
    if total == 0.0:
        return 0.0
    cum = np.concatenate([[0.0], np.cumsum(lengths)])
    return float((cum[i] + t[i] * lengths[i]) / total)


def substring(coords: np.ndarray, start_fraction: float, end_fraction: float) -> np.ndarray:
    """Sub-linestring between two fractional measures (ST_LineSubstring)."""
    coords = np.asarray(coords, dtype=np.float64)
    s = min(max(start_fraction, 0.0), 1.0)
    e = min(max(end_fraction, 0.0), 1.0)
    if e < s:
        s, e = e, s
    if len(coords) < 2:
        return coords.copy()
    lengths = _segment_lengths(coords)
    total = float(lengths.sum())
    if total == 0.0:
        return coords[:1].repeat(2, axis=0)
    cum = np.concatenate([[0.0], np.cumsum(lengths)]) / total
    pts = [line_interpolate_point(coords, s)]
    inner = coords[1:-1][(cum[1:-1] > s) & (cum[1:-1] < e)]
    for p in inner:
        pts.append((float(p[0]), float(p[1])))
    pts.append(line_interpolate_point(coords, e))
    return np.asarray(pts, dtype=np.float64)


def densify(coords: np.ndarray, max_segment_length: float) -> np.ndarray:
    """Insert vertices so every segment is <= max_segment_length (planar)."""
    if max_segment_length <= 0:
        raise ValueError("max_segment_length must be > 0")
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return coords.copy()
    out = [coords[0]]
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        seg_len = float(np.hypot(*(b - a)))
        n_splits = int(np.ceil(seg_len / max_segment_length))
        for k in range(1, n_splits):
            out.append(a + (b - a) * (k / n_splits))
        out.append(b)
    return np.asarray(out, dtype=np.float64)


def segmentize(coords: np.ndarray, n_segments: int) -> np.ndarray:
    """Split a line into n equal-length pieces; returns n+1 breakpoints."""
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    return np.asarray(
        [line_interpolate_point(coords, k / n_segments) for k in range(n_segments + 1)],
        dtype=np.float64,
    )


# --- curve similarity ---------------------------------------------------------

def frechet_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Discrete Fréchet distance, linear-memory DP over the coord grid."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0
    prev = np.empty(m, dtype=np.float64)
    dists0 = np.hypot(b[:, 0] - a[0, 0], b[:, 1] - a[0, 1])
    prev[0] = dists0[0]
    for j in range(1, m):
        prev[j] = max(prev[j - 1], dists0[j])
    for i in range(1, n):
        cur = np.empty(m, dtype=np.float64)
        di = np.hypot(b[:, 0] - a[i, 0], b[:, 1] - a[i, 1])
        cur[0] = max(prev[0], di[0])
        for j in range(1, m):
            cur[j] = max(min(prev[j - 1], prev[j], cur[j - 1]), di[j])
        prev = cur
    return float(prev[-1])


def hausdorff_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric coordinate-wise Hausdorff distance (max of directed max-min)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if len(a) == 0 or len(b) == 0:
        return 0.0
    dx = a[:, 0][:, None] - b[:, 0][None, :]
    dy = a[:, 1][:, None] - b[:, 1][None, :]
    d = np.hypot(dx, dy)
    return float(max(d.min(axis=1).max(), d.min(axis=0).max()))


# --- closest point -------------------------------------------------------------

def closest_point_on_line(coords: np.ndarray, px: float, py: float):
    """('intersection'|'single', x, y): nearest point on a polyline.

    'intersection' when the query point lies exactly on the line (the
    reference's Closest::Intersection), else 'single'.
    """
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) == 0:
        return None
    if len(coords) == 1:
        kind = "intersection" if (coords[0, 0] == px and coords[0, 1] == py) else "single"
        return (kind, float(coords[0, 0]), float(coords[0, 1]))
    a = coords[:-1]
    b = coords[1:]
    d = b - a
    seg_len2 = d[:, 0] ** 2 + d[:, 1] ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        t = ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1]) / np.where(
            seg_len2 == 0, 1, seg_len2
        )
    t = np.clip(np.where(seg_len2 == 0, 0.0, t), 0.0, 1.0)
    qx = a[:, 0] + t * d[:, 0]
    qy = a[:, 1] + t * d[:, 1]
    dist = np.hypot(px - qx, py - qy)
    i = int(np.argmin(dist))
    kind = "intersection" if dist[i] == 0.0 else "single"
    return (kind, float(qx[i]), float(qy[i]))


# --- convexity ------------------------------------------------------------------

def is_ring_convex(ring: np.ndarray, allow_collinear: bool = True) -> bool:
    """Whether a closed ring is convex (orientation scan, robust orient2d)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    n = len(ring)
    if n < 3:
        return True
    signs = set()
    for i in range(n):
        a, b, c = ring[i], ring[(i + 1) % n], ring[(i + 2) % n]
        o = int(orient2d(a[0], a[1], b[0], b[1], c[0], c[1]))
        if o == 0:
            if not allow_collinear:
                return False
            continue
        signs.add(o)
        if len(signs) > 1:
            return False
    return True


def extremes(coords: np.ndarray):
    """(min_x_idx, min_y_idx, max_x_idx, max_y_idx) per ``extremes.rs:27``."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) == 0:
        return None
    return (
        int(np.argmin(coords[:, 0])),
        int(np.argmin(coords[:, 1])),
        int(np.argmax(coords[:, 0])),
        int(np.argmax(coords[:, 1])),
    )


def minimum_rotated_rect(coords: np.ndarray) -> np.ndarray:
    """Minimum-area oriented bounding rect via rotating calipers over the hull
    (``minimum_rotated_rect.rs:29`` semantics). Returns a closed 5-pt ring."""
    from geo_spark.kernels.hull import quick_hull

    coords = np.asarray(coords, dtype=np.float64)
    hull = quick_hull(coords)
    pts = hull[:-1] if len(hull) > 1 else hull
    if len(pts) <= 2:
        return hull
    best_area = np.inf
    best = None
    edges = np.diff(np.vstack([pts, pts[:1]]), axis=0)
    for e in edges:
        norm = np.hypot(e[0], e[1])
        if norm == 0:
            continue
        ux, uy = e[0] / norm, e[1] / norm
        # rotate points into edge frame
        xs = pts[:, 0] * ux + pts[:, 1] * uy
        ys = -pts[:, 0] * uy + pts[:, 1] * ux
        w = xs.max() - xs.min()
        h = ys.max() - ys.min()
        area = w * h
        if area < best_area:
            best_area = area
            x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
            corners = np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
            )
            # rotate back
            best = np.column_stack(
                [
                    corners[:, 0] * ux - corners[:, 1] * uy,
                    corners[:, 0] * uy + corners[:, 1] * ux,
                ]
            )
    return best


def vector_dot(ax, ay, bx, by):
    return np.asarray(ax) * bx + np.asarray(ay) * by


def vector_cross(ax, ay, bx, by):
    return np.asarray(ax) * by - np.asarray(ay) * bx


def vector_normalize(ax, ay):
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    n = np.hypot(ax, ay)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(n == 0, 0.0, ax / n), np.where(n == 0, 0.0, ay / n)
