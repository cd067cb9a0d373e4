"""General polygon boolean overlay: union / intersection / difference / xor.

The reference delegates overlay to the external ``i_overlay`` crate
(``bool_ops/mod.rs:91-107``); no GEOS/shapely exists in this environment, so
this is a from-scratch arrangement-based overlay:

1. **arrangement**: every ring edge of both operands is split at every
   crossing with the other operand's edges (robust ``line_intersection``,
   incl. collinear overlaps and T-junctions);
2. **classification**: each directed sub-edge knows which operand it came
   from and has the operand's interior on its LEFT (rings are normalized:
   exteriors CCW, holes CW). The other operand's in/out at the sub-edge
   midpoint is an exact winding test (the midpoint can only lie on the other
   boundary in the collinear-overlap case, which is handled by pairing the
   shared sub-edges and comparing directions);
3. **selection**: a sub-edge borders the result iff op(left-face) !=
   op(right-face); it is emitted oriented result-interior-on-left. Shared
   collinear edges are emitted at most once;
4. **assembly**: faces are traced by always taking the sharpest
   counter-clockwise turn at each vertex; traced rings with positive area
   are exteriors, negative are holes, holes are attached to the smallest
   containing exterior.

Exactness: all orientation decisions use the robust two-stage predicates;
coordinates of split points are ordinary float64 (same value used on both
incident edges), so the arrangement is self-consistent. Inputs are assumed
valid polygons (use kernels.geom2.validate_polygon first).
"""

from __future__ import annotations

import math

import numpy as np

from geo_spark.kernels.area import ring_signed_area
from geo_spark.kernels.lines import line_intersection
from geo_spark.kernels.predicates import polygon_position, orient2d

_OPS = {
    "union": lambda a, b: a or b,
    "intersection": lambda a, b: a and b,
    "difference": lambda a, b: a and not b,
    "xor": lambda a, b: a != b,
}


def _normalized_rings(exterior, interiors):
    """[(ring coords, is_hole)] with exterior CCW and holes CW."""
    out = []
    ext = np.asarray(exterior, dtype=np.float64)
    if ring_signed_area(ext) < 0:
        ext = ext[::-1].copy()
    out.append(ext)
    for h in interiors or ():
        hh = np.asarray(h, dtype=np.float64)
        if ring_signed_area(hh) > 0:
            hh = hh[::-1].copy()
        out.append(hh)
    return out


def _edges_of(rings):
    """Directed edges (a, b) tuples with the polygon interior on the left."""
    edges = []
    for ring in rings:
        for i in range(len(ring) - 1):
            a = (float(ring[i, 0]), float(ring[i, 1]))
            b = (float(ring[i + 1, 0]), float(ring[i + 1, 1]))
            if a != b:
                edges.append((a, b))
    return edges


def _split_all(edges_a, edges_b):
    """Split each directed edge at every intersection with the other set.

    Returns (sub_a, sub_b): lists of directed sub-edges.
    """
    cuts_a = [set() for _ in edges_a]
    cuts_b = [set() for _ in edges_b]
    for i, (a0, a1) in enumerate(edges_a):
        for j, (b0, b1) in enumerate(edges_b):
            r = line_intersection(a0, a1, b0, b1)
            if r is None:
                continue
            if r[0] == "point":
                p = r[1]
                cuts_a[i].add(p)
                cuts_b[j].add(p)
            else:  # collinear overlap: cut both edges at both overlap ends
                p, q = r[1]
                cuts_a[i].update((p, q))
                cuts_b[j].update((p, q))

    def apply(edges, cuts):
        out = []
        for (a, b), cs in zip(edges, cuts):
            pts = [a, b] + [c for c in cs if c != a and c != b]
            # order along the edge by the dot-product parameter — BOTH
            # coordinates. A dominant-axis-only key ties when two crossing
            # points share that coordinate (two near-coincident edges of a
            # sliver crossing a long edge: x identical, y apart by 1e-11),
            # leaving their order arbitrary and the sub-edge chain reversed
            # — the downstream assembly then dead-ends and the overlay
            # collapsed to empty (hypothesis-found, round 5).
            dx, dy = b[0] - a[0], b[1] - a[1]
            pts.sort(key=lambda p: (p[0] - a[0]) * dx + (p[1] - a[1]) * dy)
            for k in range(len(pts) - 1):
                if pts[k] != pts[k + 1]:
                    out.append((pts[k], pts[k + 1]))
        return out

    return apply(edges_a, cuts_a), apply(edges_b, cuts_b)


def _midpoint_state(sub, other_ext, other_holes):
    """Ternary position of the sub-edge midpoint w.r.t. the other polygon."""
    (ax, ay), (bx, by) = sub
    mx, my = (ax + bx) / 2.0, (ay + by) / 2.0
    return int(polygon_position([mx], [my], other_ext, other_holes)[0])


def _poly_area_of(ext, holes) -> float:
    a = abs(ring_signed_area(np.asarray(ext, dtype=np.float64)))
    for h in holes:
        a -= abs(ring_signed_area(np.asarray(h, dtype=np.float64)))
    return a


def _snap_ring(ring, scale: float) -> np.ndarray:
    r = np.round(np.asarray(ring, dtype=np.float64) / scale) * scale
    # drop consecutive duplicates introduced by snapping, keep closure
    if len(r) > 1:
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]).any(axis=1)
        r = r[keep]
        if len(r) > 1 and not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
    return r


def boolean_op(exterior_a, interiors_a, exterior_b, interiors_b, op: str):
    """Overlay of polygon A and polygon B; returns list of (exterior, holes).

    ``op``: 'union' | 'intersection' | 'difference' | 'xor'.

    Robustness: the float-constructed overlay can collapse when an operand
    is an extreme sliver (hypothesis-found: a width-1e-3 × length-700
    triangle unioned with a large one returned EMPTY — the same regime
    where JTS's floating overlay throws TopologyException). A cheap area
    invariant (union ≥ each operand, any result ≤ |A|+|B|) detects the
    collapse and retries once on inputs snapped to a 2⁻⁴⁰-relative grid —
    OverlayNG's snap-rounding fallback pattern; the snapped answer differs
    from exact by at most grid × perimeter.
    """
    if op not in _OPS:
        raise ValueError(f"unknown op: {op}")
    res = _boolean_op_float(exterior_a, interiors_a, exterior_b, interiors_b, op)
    area_a = _poly_area_of(exterior_a, interiors_a)
    area_b = _poly_area_of(exterior_b, interiors_b)
    out_area = overlay_area(res)
    scale_ar = max(area_a, area_b, 1e-300)
    tol = 1e-9 * scale_ar
    bad = out_area > area_a + area_b + tol
    if op == "union":
        bad = bad or out_area < max(area_a, area_b) - tol
    elif op == "intersection":
        bad = bad or out_area > min(area_a, area_b) + tol
    elif op == "difference":
        bad = bad or out_area > area_a + tol
    if not bad:
        return res
    coords = np.abs(
        np.concatenate(
            [np.asarray(exterior_a, dtype=np.float64).ravel(),
             np.asarray(exterior_b, dtype=np.float64).ravel()]
        )
    )
    span = float(coords.max()) if len(coords) else 1.0
    grid = 2.0 ** (int(np.floor(np.log2(max(span, 1e-300)))) - 40)
    sa = _snap_ring(exterior_a, grid)
    sb = _snap_ring(exterior_b, grid)
    ha = [_snap_ring(h, grid) for h in interiors_a]
    hb = [_snap_ring(h, grid) for h in interiors_b]
    # snapped operands can collapse to nothing — apply the empty-operand
    # algebra directly
    a_dead = len(sa) < 4 or ring_signed_area(sa) == 0.0
    b_dead = len(sb) < 4 or ring_signed_area(sb) == 0.0
    live_h = lambda h: len(h) >= 4 and ring_signed_area(h) != 0.0  # noqa: E731
    if a_dead or b_dead:
        a_poly = [] if a_dead else [(sa, [h for h in ha if live_h(h)])]
        b_poly = [] if b_dead else [(sb, [h for h in hb if live_h(h)])]
        if op in ("union", "xor"):
            return a_poly + b_poly  # at most one side survives here
        if op == "intersection":
            return []
        return a_poly  # difference: b collapsed → a; a collapsed → []
    return _boolean_op_float(
        sa, [h for h in ha if live_h(h)], sb, [h for h in hb if live_h(h)], op
    )


def _boolean_op_float(exterior_a, interiors_a, exterior_b, interiors_b, op: str):
    fop = _OPS[op]
    rings_a = _normalized_rings(exterior_a, interiors_a)
    rings_b = _normalized_rings(exterior_b, interiors_b)
    ext_a, holes_a = rings_a[0], rings_a[1:]
    ext_b, holes_b = rings_b[0], rings_b[1:]
    sub_a, sub_b = _split_all(_edges_of(rings_a), _edges_of(rings_b))

    # index B sub-edges for shared-edge pairing (undirected key)
    b_by_key = {}
    for s in sub_b:
        b_by_key[frozenset(s)] = s

    selected = []  # directed edges, result interior on the LEFT
    emitted_shared = set()

    def consider(sub, from_a: bool):
        key = frozenset(sub)
        partner = b_by_key.get(key) if from_a else None
        if not from_a and key in emitted_shared:
            return
        if from_a and partner is not None:
            # shared collinear sub-edge: left/right in-ness from directions
            emitted_shared.add(key)
            same_dir = sub == partner
            # A interior is left of `sub`; B interior is left of `partner`
            left = (True, same_dir)
            right = (False, not same_dir)
            lv, rv = fop(*left), fop(*right)
            if lv == rv:
                return
            selected.append(sub if lv else (sub[1], sub[0]))
            return
        if not from_a:
            # check shared with A side
            pass
        other_ext = ext_b if from_a else ext_a
        other_holes = holes_b if from_a else holes_a
        state = _midpoint_state(sub, other_ext, other_holes)
        if state == 0 and not from_a:
            # lies on A's boundary → handled (or will be) via the A-side pairing
            if frozenset(sub) in a_keys:
                return
        inside_other = state == 1
        if from_a:
            left = (True, inside_other)
            right = (False, inside_other)
        else:
            left = (inside_other, True)
            right = (inside_other, False)
        lv, rv = fop(*left), fop(*right)
        if lv == rv:
            return
        selected.append(sub if lv else (sub[1], sub[0]))

    a_keys = {frozenset(s) for s in sub_a}
    for s in sub_a:
        consider(s, True)
    for s in sub_b:
        consider(s, False)

    # xor/difference can trace a region that touches itself at a shared
    # vertex as ONE pinched ring; split it into simple rings (no-op for
    # already-simple results — hypothesis round 5 caught a self-touching
    # xor exterior failing validate_polygon)
    from geo_spark.kernels.repair import _split_pinched

    return _split_pinched(_assemble(selected))


def _assemble(edges):
    """Trace faces from directed edges (interior on left) into polygons."""
    if not edges:
        return []
    out_map: dict = {}
    for e in edges:
        out_map.setdefault(e[0], []).append(e)
    unused = set(edges)
    rings = []
    for start_edge in edges:
        if start_edge not in unused:
            continue
        ring = [start_edge[0]]
        cur = start_edge
        unused.discard(cur)
        guard = 0
        while guard < 4 * len(edges):
            guard += 1
            ring.append(cur[1])
            if cur[1] == start_edge[0]:
                rings.append(ring)
                break
            outs = [e for e in out_map.get(cur[1], []) if e in unused or e == start_edge]
            if not outs:
                break  # dangling (numeric inconsistency) — drop this trace
            # continue along the same left face: take the outgoing edge with
            # the MAXIMUM counter-clockwise angle from the reversed incoming
            # direction (the sharpest left turn keeps the left face attached)
            inx, iny = cur[0][0] - cur[1][0], cur[0][1] - cur[1][1]
            base = math.atan2(iny, inx)

            def turn(e):
                vx, vy = e[1][0] - e[0][0], e[1][1] - e[0][1]
                ang = math.atan2(vy, vx) - base
                while ang <= 0:
                    ang += 2 * math.pi
                while ang > 2 * math.pi:
                    ang -= 2 * math.pi
                return ang

            nxt = max(outs, key=turn)
            cur = nxt
            unused.discard(cur)
    # classify rings: positive area = exterior, negative = hole
    exteriors = []
    holes = []
    for r in rings:
        arr = np.asarray(r, dtype=np.float64)
        if len(arr) < 4:
            continue
        a = ring_signed_area(arr)
        if a > 0:
            exteriors.append(arr)
        elif a < 0:
            holes.append(arr)
    results = [(ext, []) for ext in exteriors]
    for h in holes:
        # attach to the smallest exterior containing the hole's first vertex
        best = None
        best_area = None
        for idx, (ext, _) in enumerate(results):
            if polygon_position([h[0, 0]], [h[0, 1]], ext)[0] >= 0:
                a = abs(ring_signed_area(ext))
                if best_area is None or a < best_area:
                    best, best_area = idx, a
        if best is not None:
            results[best][1].append(h)
    return results


def multipolygon_boolean_op(polys_a, polys_b, op: str):
    """Overlay of two multipolygons (lists of (exterior, holes) pairs).

    union: folds member-unions; intersection/difference/xor distribute over
    members then union the pieces (n is small per Arrow row; the distributed
    n-way path is ``unary_union``).
    """
    if op == "union":
        return unary_union(list(polys_a) + list(polys_b))
    pieces = []
    for ea, ha in polys_a:
        for eb, hb in polys_b:
            pieces.extend(boolean_op(ea, ha, eb, hb, "intersection" if op == "intersection" else op))
    if op == "intersection":
        return unary_union(pieces) if len(pieces) > 1 else pieces
    # difference / xor over multis: A \ B = fold over B members
    if op == "difference":
        current = list(polys_a)
        for eb, hb in polys_b:
            nxt = []
            for ea, ha in current:
                nxt.extend(boolean_op(ea, ha, eb, hb, "difference"))
            current = nxt
        return current
    if op == "xor":
        d1 = multipolygon_boolean_op(polys_a, polys_b, "difference")
        d2 = multipolygon_boolean_op(polys_b, polys_a, "difference")
        return unary_union(d1 + d2)
    raise ValueError(f"unknown op: {op}")


def unary_union(polys):
    """n-way union by pairwise folding (``bool_ops/mod.rs:259-288`` does one
    overlay-graph pass; folding is the composition the distributed tree-merge
    uses — per-cell union then hierarchical combine)."""
    polys = list(polys)
    if not polys:
        return []

    def bbox(ext):
        a = np.asarray(ext, dtype=np.float64)
        return (a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max())

    def bbox_disjoint(b1, b2):
        return b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1]

    acc = [polys[0]]
    acc_bb = [bbox(polys[0][0])]
    for ext, holes in polys[1:]:
        merged = []
        remaining = (ext, holes)
        rem_bb = bbox(ext)
        consumed = False
        out = []
        out_bb = []
        for aext, aholes, abb in ((a, h, b) for (a, h), b in zip(acc, acc_bb)):
            if remaining is not None:
                # separated bboxes can never merge: skip the overlay (and
                # its degenerate-pair retries) entirely
                if bbox_disjoint(abb, rem_bb):
                    out.append((aext, aholes))
                    out_bb.append(abb)
                    continue
                u = boolean_op(aext, aholes, remaining[0], remaining[1], "union")
                if len(u) != 1:
                    # near-degenerate pairs (shallow-angle overlaps) can fail
                    # one insertion order but succeed the other — retry
                    # swapped before concluding the pieces are disjoint
                    u2 = boolean_op(remaining[0], remaining[1], aext, aholes, "union")
                    if len(u2) == 1:
                        u = u2
                if len(u) != 1:
                    # last resort for a genuinely-overlapping pair the direct
                    # union can't arrange: a ∪ b = a ∪ (b − a) — the pieces
                    # of b − a are edge-adjacent to a (coincident-seam
                    # unions are the overlay's well-conditioned grid case).
                    # For truly disjoint a, b the adjacent-union below simply
                    # fails to fuse and the pieces stay separate, as before.
                    d = boolean_op(remaining[0], remaining[1], aext, aholes, "difference")
                    cur = (aext, aholes)
                    ok = True
                    for pext, pholes in d:
                        uu = boolean_op(cur[0], cur[1], pext, pholes, "union")
                        if len(uu) == 1:
                            cur = uu[0]
                        else:
                            ok = False
                            break
                    if ok:
                        u = [cur]
                if len(u) == 1:
                    remaining = u[0]
                    rem_bb = bbox(remaining[0])
                    consumed = True
                    continue
            out.append((aext, aholes))
            out_bb.append(abb)
        if remaining is not None:
            out.append(remaining)
            out_bb.append(rem_bb)
        acc = out
        acc_bb = out_bb
    return acc


def clip_lines_by_polygon(coords: np.ndarray, exterior, interiors=(), invert: bool = False):
    """``BooleanOps::clip`` (``bool_ops/mod.rs:173-208``): the parts of a
    polyline inside (or, with ``invert``, outside) a polygon; boundary
    included in both. Returns a list of coordinate arrays."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return []
    rings = [np.asarray(exterior, dtype=np.float64)] + [
        np.asarray(h, dtype=np.float64) for h in interiors
    ]
    pieces = []
    current: list = []
    for i in range(len(coords) - 1):
        a = (float(coords[i, 0]), float(coords[i, 1]))
        b = (float(coords[i + 1, 0]), float(coords[i + 1, 1]))
        # split the segment at all boundary crossings
        cut_ts = {0.0, 1.0}
        dx, dy = b[0] - a[0], b[1] - a[1]
        for ring in rings:
            for j in range(len(ring) - 1):
                r = line_intersection(a, b, tuple(ring[j]), tuple(ring[j + 1]))
                if r is None:
                    continue
                pts = [r[1]] if r[0] == "point" else list(r[1])
                for p in pts:
                    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / (dx * dx + dy * dy)
                    cut_ts.add(min(max(t, 0.0), 1.0))
        ts = sorted(cut_ts)
        for k in range(len(ts) - 1):
            t0, t1 = ts[k], ts[k + 1]
            if t1 <= t0:
                continue
            p0 = (a[0] + t0 * dx, a[1] + t0 * dy)
            p1 = (a[0] + t1 * dx, a[1] + t1 * dy)
            mx, my = (p0[0] + p1[0]) / 2.0, (p0[1] + p1[1]) / 2.0
            pos = int(polygon_position([mx], [my], exterior, interiors)[0])
            keep = (pos >= 0) if not invert else (pos <= 0)
            if keep:
                if not current:
                    current = [p0, p1]
                elif current[-1] == p0:
                    current.append(p1)
                else:
                    pieces.append(np.asarray(current))
                    current = [p0, p1]
            else:
                if current:
                    pieces.append(np.asarray(current))
                    current = []
    if current:
        pieces.append(np.asarray(current))
    return pieces


def overlay_area(results) -> float:
    """Total area of an overlay result list."""
    total = 0.0
    for ext, holes in results:
        total += abs(ring_signed_area(ext))
        for h in holes:
            total -= abs(ring_signed_area(h))
    return total
