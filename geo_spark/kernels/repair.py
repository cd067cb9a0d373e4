"""MakeValid — polygon repair with odd-even (prepair) semantics.

Parity target: the reference's ``MakeValid``
(``geo/src/algorithm/repair_polygon/mod.rs``), which implements Ledoux /
Arroyo Ohori / Meijers 2014 ("prepair"): triangulate the noded edges,
odd-even flood-fill the faces, reconstruct boundaries.

This implementation produces the same fill-rule result without building a
constrained Delaunay triangulation: in the noded arrangement, a face's
odd-even label flips exactly when crossing an edge of odd multiplicity, so

1. node every ring edge at every intersection (the overlay's exact
   ``_split_all`` — robust orientation gates + collinear overlaps);
2. cancel sub-edges of even multiplicity (shared shell/hole edges, dangling
   protrusions — identical to the paper's even-count cancellation);
3. orient each surviving sub-edge with the odd-parity side on its left
   (parity = ray-crossing count against the surviving edges, which equals
   the flood-fill label);
4. trace faces with the overlay's max-CCW-turn assembler — pinch vertices
   (banana polygons) split naturally because the trace takes the sharpest
   left turn.

Output is always a valid multipolygon list [(exterior, holes)], possibly
empty (e.g. hole identical to shell cancels everything).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from geo_spark.kernels.boolops import _assemble


def _self_split(edges):
    """Split every edge at its intersections with every other edge.

    Each unordered pair is evaluated ONCE and the same intersection point is
    added to both edges' cut sets — evaluating (i,j) and (j,i) separately
    (as reusing the two-set overlay splitter would) can yield points an ulp
    apart from the two parametric solves, silently disconnecting the noded
    graph at that vertex."""
    from geo_spark.kernels.lines import line_intersection

    cuts = [set() for _ in edges]
    for i in range(len(edges)):
        a0, a1 = edges[i]
        for j in range(i + 1, len(edges)):
            b0, b1 = edges[j]
            r = line_intersection(a0, a1, b0, b1)
            if r is None:
                continue
            if r[0] == "point":
                cuts[i].add(r[1])
                cuts[j].add(r[1])
            else:
                p, q = r[1]
                cuts[i].update((p, q))
                cuts[j].update((p, q))
    out = []
    for (a, b), cs in zip(edges, cuts):
        pts = [a, b] + [c for c in cs if c != a and c != b]
        dx, dy = b[0] - a[0], b[1] - a[1]
        if abs(dx) >= abs(dy):
            pts.sort(key=lambda p: (p[0] - a[0]) / dx if dx else 0.0)
        else:
            pts.sort(key=lambda p: (p[1] - a[1]) / dy)
        for k in range(len(pts) - 1):
            if pts[k] != pts[k + 1]:
                out.append((pts[k], pts[k + 1]))
    return out


def _undirected(e):
    a, b = e
    return (a, b) if a <= b else (b, a)


def _ray_parity(mid, direction, edges, skip) -> int | None:
    """Crossing count of ray mid + t·direction (t>0) vs edges; None if the
    ray passes (numerically) through a segment endpoint — caller retries
    with a rotated direction."""
    mx, my = mid
    dx, dy = direction
    crossings = 0
    for e in edges:
        if e is skip:
            continue
        (px, py), (qx, qy) = e
        ex, ey = qx - px, qy - py
        denom = dx * ey - dy * ex
        if denom == 0.0:
            # parallel: endpoint-on-ray would be caught by neighbors' checks
            continue
        # solve mid + t·d = p + u·e
        wx, wy = px - mx, py - my
        t = (wx * ey - wy * ex) / denom
        u = (wx * dy - wy * dx) / denom
        if t <= 1e-12:
            continue
        if -1e-12 < u < 1e-12 or 1 - 1e-12 < u < 1 + 1e-12:
            return None  # grazes an endpoint — ambiguous, retry
        if 0.0 < u < 1.0:
            crossings += 1
    return crossings


def _left_is_odd(edge, edges) -> bool:
    (ax, ay), (bx, by) = edge
    mx, my = (ax + bx) / 2.0, (ay + by) / 2.0
    nx, ny = ay - by, bx - ax  # left normal of a→b
    for rot in (0.0, 0.1, -0.17, 0.23, -0.31, 0.41, -0.47):
        c, s = math.cos(rot), math.sin(rot)
        d = (nx * c - ny * s, nx * s + ny * c)
        res = _ray_parity((mx, my), d, edges, edge)
        if res is not None:
            return res % 2 == 1
    # pathological grazing in every direction — treat as exterior-left
    return False


def make_valid_rings(rings) -> list:
    """Repair the region bounded by ``rings`` (odd-even fill) into a valid
    multipolygon [(exterior, holes)]."""
    edges = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if len(ring) < 2:
            continue
        if (ring[0] != ring[-1]).any():
            ring = np.vstack([ring, ring[:1]])
        for k in range(len(ring) - 1):
            a = (float(ring[k, 0]), float(ring[k, 1]))
            b = (float(ring[k + 1, 0]), float(ring[k + 1, 1]))
            if a != b:
                edges.append((a, b))
    if not edges:
        return []
    return _edges_to_valid(_self_split(edges))


def _edges_to_valid(sub) -> list:
    """Noded edge soup → valid multipolygon: cancel even-multiplicity edges,
    orient survivors by odd-even parity, trace faces, split pinches."""
    counts = Counter(_undirected(e) for e in sub)
    survivors = [key for key, c in counts.items() if c % 2 == 1]
    if not survivors:
        return []
    selected = []
    for key in survivors:
        if _left_is_odd(key, survivors):
            selected.append(key)
        else:
            selected.append((key[1], key[0]))
    results = _assemble(selected)
    return _split_pinched(results)


def _seg_hits_pixel(a, b, v, h: float) -> bool:
    """Does segment a→b enter the HALF-OPEN pixel [v-h, v+h) × [v-h, v+h)?

    Half-open on the top/right matches half-up coordinate snapping (a point
    exactly on a pixel's top/right boundary belongs to the neighbor pixel),
    so an endpoint always lies inside the pixel it snaps to, while edges
    that merely graze a corner or run along the top/right boundary do not
    bend — the consistency JTS hot pixels guarantee."""
    t0, t1 = 0.0, 1.0
    dx, dy = b[0] - a[0], b[1] - a[1]
    for p, q in (
        (-dx, a[0] - (v[0] - h)),
        (dx, (v[0] + h) - a[0]),
        (-dy, a[1] - (v[1] - h)),
        (dy, (v[1] + h) - a[1]),
    ):
        if p == 0:
            if q < 0:
                return False
        else:
            r = q / p
            if p < 0:
                t0 = max(t0, r)
            else:
                t1 = min(t1, r)
            if t0 > t1:
                return False
    # a representative point of the clipped interval must satisfy the
    # half-open bounds (rejects contact limited to the top/right boundary)
    tm = 0.5 * (t0 + t1)
    x = a[0] + tm * dx
    y = a[1] + tm * dy
    return (v[0] - h <= x < v[0] + h) and (v[1] - h <= y < v[1] + h)


def snap_round_rings(
    rings, scale: float, max_iter: int = 8, extra_edges=(), return_collapsed: bool = False
):
    """Fixed-precision (snap-rounding) repair of a ring soup → valid
    multipolygon on the 1/scale grid.

    ``extra_edges``: segments that participate in noding, hot-pixel
    generation and routing but NOT in the odd-even parity (e.g. a cutting
    line in a fixed-precision polygon-minus-line: it contributes vertices
    that collapse slivers, but bounds no area).

    Classic hot-pixel snap rounding (Hobby/JTS lineage) composed with the
    odd-even repair: iterate { node edges at intersections → snap every
    vertex to the grid → re-route each edge through the hot pixel of every
    grid vertex it passes } until stable, then cancel/orient/assemble. The
    re-routing is what vertex-only snapping misses: a long edge passing
    within half a pixel of a snapped vertex must bend through it, which is
    how nearly-coincident edge bundles collapse consistently.
    """
    h = 0.5 / scale

    def snap(p):
        # half-up (JTS PrecisionModel), not banker's rounding — must agree
        # with the half-open pixel extent so snap(p) is p's containing pixel
        return (
            math.floor(p[0] * scale + 0.5) / scale,
            math.floor(p[1] * scale + 0.5) / scale,
        )

    edges = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if len(ring) < 2:
            continue
        if (ring[0] != ring[-1]).any():
            ring = np.vstack([ring, ring[:1]])
        for k in range(len(ring) - 1):
            a = (float(ring[k, 0]), float(ring[k, 1]))
            b = (float(ring[k + 1, 0]), float(ring[k + 1, 1]))
            if a != b:
                edges.append((a, b))
    if not edges:
        return ([], []) if return_collapsed else []

    ring_edges = edges
    extra = []
    for a, b in extra_edges:
        a = (float(a[0]), float(a[1]))
        b = (float(b[0]), float(b[1]))
        if a != b:
            extra.append((a, b))

    # Iterate { node → snap → re-route } until the routed edge multiset is
    # stable (bounded by max_iter). A single pass can leave off-grid
    # intersections between ROUTED edges (two grid segments may cross at a
    # non-grid point); re-noding + re-routing bends both through that
    # point's hot pixel, so the converged output has every vertex on the
    # grid and every crossing at a vertex.
    for _ in range(max(1, max_iter)):
        sub_tagged = _self_split_tagged(ring_edges + extra)
        # hot pixels: every vertex and every exact intersection point,
        # snapped to the grid (the JTS SnapRoundingNoder shape)
        pixels = set()
        for a, b, _ in sub_tagged:
            pixels.add(snap(a))
            pixels.add(snap(b))
        n_ring = len(ring_edges)
        routed_ring, routed_extra = [], []
        for a, b, idx in sub_tagged:
            hits = [v for v in pixels if _seg_hits_pixel(a, b, v, h)]
            dx, dy = b[0] - a[0], b[1] - a[1]
            # order along the segment by projection onto its direction (a
            # dominant-axis sort ties when two pixels share that coordinate)
            hits.sort(key=lambda p: (p[0] - a[0]) * dx + (p[1] - a[1]) * dy)
            target = routed_ring if idx < n_ring else routed_extra
            for k in range(len(hits) - 1):
                if hits[k] != hits[k + 1]:
                    target.append((hits[k], hits[k + 1]))
        stable = Counter(map(_undirected, routed_ring)) == Counter(
            map(_undirected, ring_edges)
        ) and Counter(map(_undirected, routed_extra)) == Counter(map(_undirected, extra))
        ring_edges, extra = routed_ring, routed_extra
        if not ring_edges:
            return ([], []) if return_collapsed else []
        if stable:
            break
    final = _self_split(ring_edges)
    result = _edges_to_valid(final)
    if not return_collapsed:
        return result
    # even-multiplicity edges cancel in the odd-even parity — they are the
    # snap-rounded form of collapsed spikes/slivers (zero-width strips whose
    # two sides landed on the same grid edges). The caller decides which of
    # them are LINE output (exterior to the surviving area) vs interior
    # seams (absorbed).
    counts = Counter(_undirected(e) for e in final)
    collapsed = [key for key, cnt in counts.items() if cnt % 2 == 0]
    return result, collapsed


def _split_pinch_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Split a closed ring that revisits vertices (pinch points) into simple
    closed rings — each extracted loop keeps its winding, so a figure-8
    boundary walk separates back into the exterior and its touching hole."""
    verts = [tuple(v) for v in np.asarray(ring, dtype=np.float64)[:-1]]
    out = []
    path: list = []
    seen: dict = {}
    for v in verts:
        if v in seen:
            i = seen[v]
            loop = path[i:] + [v]
            for w in path[i:]:
                seen.pop(w, None)
            path = path[:i]
            if len(loop) >= 4:
                out.append(np.asarray(loop, dtype=np.float64))
        seen[v] = len(path)
        path.append(v)
    if len(path) >= 3:
        out.append(np.asarray(path + [path[0]], dtype=np.float64))
    return out


def _split_pinched(results) -> list:
    """Re-split any pinched rings in an assembled multipolygon and
    re-classify (positive area → exterior, negative → hole, containment
    attachment) — mirrors the reference's pinch-point splitting phase."""
    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.predicates import polygon_position

    rings = []
    for ext, holes in results:
        rings.append(np.asarray(ext, dtype=np.float64))
        rings.extend(np.asarray(h, dtype=np.float64) for h in holes)
    if all(len(np.unique(r[:-1], axis=0)) == len(r) - 1 for r in rings):
        return results  # already simple
    simple = []
    for r in rings:
        simple.extend(_split_pinch_ring(r))
    exteriors, holes = [], []
    for r in simple:
        a = ring_signed_area(r)
        if a > 0:
            exteriors.append(r)
        elif a < 0:
            holes.append(r)
    out = [(ext, []) for ext in exteriors]
    for h in holes:
        best, best_area = None, None
        for idx, (ext, _) in enumerate(out):
            if polygon_position(h[:-1, 0], h[:-1, 1], ext).min() >= 0:
                a = abs(ring_signed_area(ext))
                if best_area is None or a < best_area:
                    best, best_area = idx, a
        if best is not None:
            out[best][1].append(h)
    return out


def make_valid(exterior, interiors=()) -> list:
    """Repair one (possibly invalid) polygon → valid [(exterior, holes)]."""
    return make_valid_rings([exterior, *interiors])


def make_valid_multipolygon(polys) -> list:
    """Repair a multipolygon (all components' rings share one odd-even
    arrangement — overlapping shells cancel, per the prepair fill rule)."""
    rings = []
    for ext, holes in polys:
        rings.append(ext)
        rings.extend(holes)
    return make_valid_rings(rings)


def _self_split_tagged(edges):
    """``_self_split`` that also reports each sub-edge's parent edge index."""
    from geo_spark.kernels.lines import line_intersection

    cuts = [set() for _ in edges]
    for i in range(len(edges)):
        a0, a1 = edges[i]
        for j in range(i + 1, len(edges)):
            b0, b1 = edges[j]
            r = line_intersection(a0, a1, b0, b1)
            if r is None:
                continue
            if r[0] == "point":
                cuts[i].add(r[1])
                cuts[j].add(r[1])
            else:
                p, q = r[1]
                cuts[i].update((p, q))
                cuts[j].update((p, q))
    out = []
    for idx, ((a, b), cs) in enumerate(zip(edges, cuts)):
        pts = [a, b] + [c for c in cs if c != a and c != b]
        dx, dy = b[0] - a[0], b[1] - a[1]
        if abs(dx) >= abs(dy):
            pts.sort(key=lambda p: (p[0] - a[0]) / dx if dx else 0.0)
        else:
            pts.sort(key=lambda p: (p[1] - a[1]) / dy)
        for k in range(len(pts) - 1):
            if pts[k] != pts[k + 1]:
                out.append((pts[k], pts[k + 1], idx))
    return out


def snap_round_linework(lines_a, lines_b, scale: float):
    """Joint snap-rounding of two lineworks → (segs_a, segs_b).

    Hot pixels come from BOTH inputs' vertices and all mutual intersection
    points, and each side's edges are routed through the joint pixel set —
    so collinear-after-rounding portions end up as identical sub-segments
    on both sides (the property the fixed-precision line overlays need).
    Output segments are on-grid, noded, and deduped per side.
    """
    h = 0.5 / scale

    def snap(p):
        return (
            math.floor(p[0] * scale + 0.5) / scale,
            math.floor(p[1] * scale + 0.5) / scale,
        )

    edges = []
    side_of = []
    for side, lines in ((0, lines_a), (1, lines_b)):
        for l in lines:
            l = np.asarray(l, dtype=np.float64)
            for k in range(len(l) - 1):
                a = (float(l[k, 0]), float(l[k, 1]))
                b = (float(l[k + 1, 0]), float(l[k + 1, 1]))
                if a != b:
                    edges.append((a, b))
                    side_of.append(side)
    if not edges:
        return [], []
    sub = _self_split_tagged(edges)
    pixels = set()
    for a, b, _ in sub:
        pixels.add(snap(a))
        pixels.add(snap(b))
    out = ([], [])
    seen = (set(), set())
    for a, b, idx in sub:
        side = side_of[idx]
        hits = [v for v in pixels if _seg_hits_pixel(a, b, v, h)]
        dx, dy = b[0] - a[0], b[1] - a[1]
        hits.sort(key=lambda p: (p[0] - a[0]) * dx + (p[1] - a[1]) * dy)
        for k in range(len(hits) - 1):
            p, q = hits[k], hits[k + 1]
            if p == q:
                continue
            key = (p, q) if p <= q else (q, p)
            if key not in seen[side]:
                seen[side].add(key)
                out[side].append((p, q))
    return out[0], out[1]
