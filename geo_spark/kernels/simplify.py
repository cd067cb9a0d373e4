"""Line simplification & smoothing kernels.

Behavior parity targets:

- Ramer-Douglas-Peucker: ``geo/src/algorithm/simplify.rs:21-144`` — epsilon
  <= 0 returns input unchanged; farthest-point scan keeps the LAST maximum
  on ties (``distance >= farthest_distance`` fold); splits only when the
  farthest distance is strictly > epsilon; a minimum retained length
  (2 for lines, 4 for rings) guards against degenerate output;
- Visvalingam-Whyatt: ``simplify_vw.rs:63-160`` — epsilon is the minimum
  *triangle area*; points are removed while the smallest effective triangle
  area is <= epsilon, with neighbor-area recomputation;
- Chaikin corner-cutting: ``chaikin_smoothing.rs:19`` — quarter/three-quarter
  subdivision, endpoints preserved for open lines, ring closure preserved;
- RemoveRepeatedPoints: ``remove_repeated_points.rs:14`` — consecutive
  duplicate culling.
"""

from __future__ import annotations

import heapq

import numpy as np

from geo_spark.kernels.measures import point_segment_distance


def rdp_indices(coords: np.ndarray, epsilon: float, initial_min: int = 2) -> list[int]:
    """Indices retained by RDP (reference recursion order & tie rule)."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if epsilon <= 0.0:
        return list(range(n))
    simplified_len = [n]

    def compute(lo: int, hi: int) -> list[int]:
        length = hi - lo
        if length == 0:
            return []
        if length == 1:
            return [lo]
        if length == 2:
            return [lo, lo + 1]
        first = coords[lo]
        last = coords[hi - 1]
        seg = coords[lo + 1 : hi - 1]
        dists = point_segment_distance(
            seg[:, 0], seg[:, 1], first[0], first[1], last[0], last[1]
        )
        # `>=` fold → last maximum wins, matching the reference
        far_rel = int(len(dists) - 1 - np.argmax(dists[::-1]))
        farthest_distance = float(dists[far_rel])
        farthest = lo + 1 + far_rel
        if farthest_distance > epsilon:
            left = compute(lo, farthest + 1)
            left.pop()
            left.extend(compute(farthest, hi))
            return left
        number_culled = length - 2
        new_length = simplified_len[0] - number_culled
        if new_length < initial_min:
            return list(range(lo, hi))
        simplified_len[0] = new_length
        return [lo, hi - 1]

    return compute(0, n)


def rdp(coords: np.ndarray, epsilon: float, initial_min: int = 2) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    return coords[rdp_indices(coords, epsilon, initial_min)]


def _triangle_area(a, b, c) -> float:
    return abs(
        (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    ) / 2.0


def visvalingam_indices(coords: np.ndarray, epsilon: float) -> list[int]:
    """Indices retained by Visvalingam-Whyatt (min-area epsilon)."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n < 3 or epsilon <= 0.0:
        return list(range(n))
    left = list(range(-1, n - 1))
    right = list(range(1, n + 1))
    alive = [True] * n
    heap: list[tuple[float, int, int]] = []
    version = [0] * n

    def push(i):
        li, ri = left[i], right[i]
        if li < 0 or ri >= n:
            return
        area = _triangle_area(coords[li], coords[i], coords[ri])
        version[i] += 1
        heapq.heappush(heap, (area, i, version[i]))

    for i in range(1, n - 1):
        push(i)

    while heap:
        area, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i]:
            continue
        if area > epsilon:
            break
        alive[i] = False
        li, ri = left[i], right[i]
        if li >= 0:
            right[li] = ri
        if ri < n:
            left[ri] = li
        for j in (li, ri):
            if 0 < j < n - 1 and alive[j]:
                push(j)
    return [i for i in range(n) if alive[i]]


def visvalingam(coords: np.ndarray, epsilon: float) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    return coords[visvalingam_indices(coords, epsilon)]


def visvalingam_preserve_indices(
    coords: np.ndarray,
    epsilon: float,
    initial_min: int = 2,
    min_points: int = 4,
) -> list[int]:
    """Topology-preserving Visvalingam (``simplify_vw.rs:306-413`` semantics,
    the Jason Davies technique): the min-area point is removed even when the
    replacement segment self-intersects, and the spatially *preceding*
    neighbor is then demoted to area -epsilon so it is removed next (which
    resolves the intersection); with ≤ ``min_points`` left an intersecting
    removal stops the process instead.
    """
    from geo_spark.kernels.predicates import segments_intersect

    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n < 3 or epsilon <= 0.0:
        return list(range(n))

    adjacent = [(-1, 1)] + [(i - 1, i + 1) for i in range(1, n)]
    counter = n
    pq: list = []
    seq = 0
    for i in range(1, n - 1):
        heapq.heappush(
            pq, (_triangle_area(coords[i - 1], coords[i], coords[i + 1]), seq, i, i - 1, i + 1)
        )
        seq += 1

    def alive_segments():
        i = 0
        while 0 <= i < n:
            j = adjacent[i][1]
            if j >= n:
                break
            yield i, j
            i = j

    def tree_intersect(l: int, cur: int, r: int) -> bool:
        a, b = coords[l], coords[r]
        tri = np.array([coords[l], coords[cur], coords[r]])
        txmin, tymin = tri.min(axis=0)
        txmax, tymax = tri.max(axis=0)
        for (s, e) in alive_segments():
            cs, ce = coords[s], coords[e]
            if max(cs[0], ce[0]) < txmin or min(cs[0], ce[0]) > txmax:
                continue
            if max(cs[1], ce[1]) < tymin or min(cs[1], ce[1]) > tymax:
                continue
            # exclude segments sharing an endpoint coordinate with (a, b)
            if (
                (cs == a).all() or (cs == b).all() or (ce == a).all() or (ce == b).all()
            ):
                continue
            if segments_intersect(a[0], a[1], b[0], b[1], cs[0], cs[1], ce[0], ce[1])[()]:
                return True
        return False

    removed = [False] * n
    while pq:
        area, _, cur, l, r = heapq.heappop(pq)
        if area > epsilon:
            break
        if counter <= initial_min:
            break
        al, ar = adjacent[cur]
        if al != l or ar != r:
            continue  # stale entry
        intersector = tree_intersect(l, cur, r)
        if intersector and counter <= min_points:
            break
        ll = adjacent[l][0]
        rr = adjacent[r][1]
        adjacent[l] = (ll, r)
        adjacent[r] = (l, rr)
        adjacent[cur] = (0, 0)
        removed[cur] = True
        counter -= 1
        for (ai, cp, bi) in ((ll, l, r), (l, r, rr)):
            if ai < 0 or bi >= n or ai >= n:
                continue
            new_area = _triangle_area(coords[ai], coords[cp], coords[bi])
            if intersector and cp < cur:
                new_area = -epsilon
            heapq.heappush(pq, (new_area, seq, cp, ai, bi))
            seq += 1
    return [i for i in range(n) if not removed[i]]


def visvalingam_preserve(coords: np.ndarray, epsilon: float) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    return coords[visvalingam_preserve_indices(coords, epsilon)]


def chaikin_smoothing(coords: np.ndarray, n_iterations: int = 1) -> np.ndarray:
    """Chaikin corner cutting; closed rings stay closed, open endpoints kept."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 3 or n_iterations <= 0:
        return coords.copy()
    closed = bool((coords[0] == coords[-1]).all())
    out = coords.copy()
    for _ in range(n_iterations):
        pts = out[:-1] if closed else out
        a = pts[:-1]
        b = pts[1:]
        q = a * 0.75 + b * 0.25
        r = a * 0.25 + b * 0.75
        mid = np.empty((2 * len(a), 2), dtype=np.float64)
        mid[0::2] = q
        mid[1::2] = r
        if closed:
            # wrap the joint between last and first point
            qa = pts[-1] * 0.75 + pts[0] * 0.25
            ra = pts[-1] * 0.25 + pts[0] * 0.75
            out = np.vstack([mid, qa, ra, mid[:1]])
        else:
            out = np.vstack([pts[:1], mid, pts[-1:]])
    return out


def remove_repeated_points(coords: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate coordinates."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return coords.copy()
    keep = np.ones(len(coords), dtype=bool)
    keep[1:] = (coords[1:] != coords[:-1]).any(axis=1)
    return coords[keep]
