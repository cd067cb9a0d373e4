"""Buffer (offset) construction via rectangle + vertex-circle union.

Parity target: ``Buffer`` (``geo/src/algorithm/buffer.rs:59``, delegating to
i_overlay stroke/outline). Re-expressed with the engine's own overlay:
round-join buffers are the union of one rectangle per segment plus one
polygonal circle per *vertex*.

Robustness note: per-segment half-caps would discretize the same circle at
different angle offsets on adjacent segments, producing ulp-scale
nearly-coincident arcs that no exact float overlay can order consistently.
One circle per vertex on an absolute angle grid makes coincident geometry
bitwise identical, and rectangle/circle boundaries cross transversally —
the overlay stays in its well-conditioned regime.

Deterministic: circle vertices are exact trig of fixed global angles;
``quad_segs`` is the GEOS-style quarter-circle vertex count.
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernels.boolops import multipolygon_boolean_op, unary_union


def circle_ring(cx: float, cy: float, r: float, quad_segs: int = 8) -> np.ndarray:
    """Polygonal circle on the absolute angle grid (same center → same ring).

    The grid is offset by a tiny irrational fraction (1e-6 golden-ratio of
    a step) so no vertex ever lands exactly on an axis-aligned or 45° ray:
    segment-rectangle corners lie on such rays, and a circle vertex exactly
    on a rectangle corner ray is the vertex-on-edge degeneracy the overlay
    must not be fed. The offset (~1e-7 r displacement — far above ulp, far
    below any curve tolerance) is the same for every circle, so coincident
    circles stay bitwise identical.
    """
    n = max(4 * quad_segs, 8)
    ang = (np.arange(n) + 0.3819660112501051e-6) * (2.0 * np.pi / n)
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def segment_rectangle(a, b, r: float) -> np.ndarray | None:
    """CCW rectangle of half-width r around segment (a, b)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d = b - a
    length = float(np.hypot(d[0], d[1]))
    if length == 0.0:
        return None
    nx, ny = -d[1] / length * r, d[0] / length * r
    ring = np.array(
        [
            [a[0] - nx, a[1] - ny],
            [b[0] - nx, b[1] - ny],
            [b[0] + nx, b[1] + ny],
            [a[0] + nx, a[1] + ny],
            [a[0] - nx, a[1] - ny],
        ]
    )
    return ring


def _mitre_wedge(u, v, w, r: float, mitre_limit: float, bevel_only: bool, quad_segs: int = 8):
    """Join piece filling the gap on the outside of the turn at vertex v.

    Adjacent segment rectangles leave a pie-slice gap on the convex side of
    each bend; the mitre join fills it with the quad (v, p1, m, p2) where m
    is the intersection of the two offset lines (JTS JOIN_MITRE), truncated
    to a bevel triangle (v, p1, p2) past ``mitre_limit``·r or when
    ``bevel_only`` (JOIN_BEVEL). Collinear joints need no piece. Returns a
    closed ring or None.
    """
    d1 = v - u
    d2 = w - v
    l1 = float(np.hypot(d1[0], d1[1]))
    l2 = float(np.hypot(d2[0], d2[1]))
    if l1 == 0.0 or l2 == 0.0:
        return None
    d1 /= l1
    d2 /= l2
    cross = d1[0] * d2[1] - d1[1] * d2[0]
    dot = d1[0] * d2[0] + d1[1] * d2[1]
    if cross == 0.0:
        return None
    # near-straight joint: the exact wedge is a hair-thin sliver whose
    # nearly-coincident edges destabilize the overlay; a round join here
    # deviates from the mitre by ≤ r·(1 − cos(turn/2)) ≈ r·turn²/8 — far
    # below the dist/100 curve tolerance — and circles are the overlay-safe
    # piece shape (module robustness note)
    if abs(cross) < 0.05 and dot > 0:
        return circle_ring(v[0], v[1], r, quad_segs)
    if cross > 0:  # left turn → gap on the right side
        n1 = np.array([d1[1], -d1[0]])
        n2 = np.array([d2[1], -d2[0]])
    else:  # right turn → gap on the left side
        n1 = np.array([-d1[1], d1[0]])
        n2 = np.array([-d2[1], d2[0]])
    p1 = v + n1 * r
    p2 = v + n2 * r
    # pull the apex slightly to the covered side: the edges (apex → p1/p2)
    # must cross the segment rectangles transversally — with the apex AT v
    # they coincide with exactly half of each rectangle's end edge, the
    # partially-overlapping-collinear case exact overlays can't order
    # (same robustness rule as the absolute-angle circles, see module doc)
    apex = v - (n1 + n2) * (0.05 * r)
    if not bevel_only:
        # offset-line intersection: p1 + t·d1 == p2 + s·d2
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        rhs = p2 - p1
        t = (rhs[0] * d2[1] - rhs[1] * d2[0]) / denom
        m = p1 + t * d1
        if float(np.hypot(m[0] - v[0], m[1] - v[1])) <= mitre_limit * r:
            ring = np.array([apex, p1, m, p2, apex], dtype=np.float64)
            return _ccw(ring)
    ring = np.array([apex, p1, p2, apex], dtype=np.float64)
    return _ccw(ring)


def _ccw(ring: np.ndarray) -> np.ndarray:
    """Orient a closed ring CCW (the union's exterior convention — circle
    pieces are CCW by construction; wedges must match)."""
    from geo_spark.kernels.area import ring_signed_area

    return ring if ring_signed_area(ring) >= 0 else ring[::-1]


def _join_pieces(ring, r: float, quad_segs: int, join: str, mitre_limit: float, closed: bool):
    """Per-vertex join pieces for one ring/polyline boundary."""
    pieces = []
    n = len(ring)
    if join == "round":
        vs = ring[:-1] if closed else ring
        for v in vs:
            pieces.append((circle_ring(v[0], v[1], r, quad_segs), []))
        return pieces
    bevel_only = join == "bevel"
    if closed:
        idxs = range(n - 1)  # joint at every ring vertex (last == first)
        for i in idxs:
            u = ring[(i - 1) % (n - 1)]
            v = ring[i]
            w = ring[(i + 1) % (n - 1)]
            wedge = _mitre_wedge(
                np.asarray(u, float), np.asarray(v, float), np.asarray(w, float),
                r, mitre_limit, bevel_only, quad_segs,
            )
            if wedge is not None:
                pieces.append((wedge, []))
    else:
        for i in range(1, n - 1):
            wedge = _mitre_wedge(
                np.asarray(ring[i - 1], float),
                np.asarray(ring[i], float),
                np.asarray(ring[i + 1], float),
                r, mitre_limit, bevel_only, quad_segs,
            )
            if wedge is not None:
                pieces.append((wedge, []))
        # flat (butt→square) caps for non-round joins: JTS mitre buffers use
        # square caps only via cap style; the corpus only erodes polygons,
        # so open-line caps keep the round default
        for v in (ring[0], ring[-1]):
            pieces.append((circle_ring(v[0], v[1], r, quad_segs), []))
    return pieces


def _collapse_close_vertices(ring: np.ndarray, tol: float, closed: bool) -> np.ndarray:
    """Drop vertices closer than ``tol`` to their predecessor (JTS
    OffsetCurveBuilder's CURVE_VERTEX_SNAP_DISTANCE_FACTOR = 1e-6 · distance):
    a near-duplicate vertex gives the joint an arbitrary direction and a
    mitre wedge can swing across the shape's interior."""
    if tol <= 0 or len(ring) < 3:
        return ring
    keep = [0]
    for i in range(1, len(ring)):
        prev = ring[keep[-1]]
        if float(np.hypot(ring[i, 0] - prev[0], ring[i, 1] - prev[1])) > tol:
            keep.append(i)
    out = ring[keep]
    if closed:
        if len(out) > 1 and float(np.hypot(*(out[-1] - out[0]))) <= tol:
            out = out[:-1]
        if len(out) >= 1 and (out[0] != out[-1]).any():
            out = np.vstack([out, out[:1]])
    return out


def _stroke_pieces(rings, r: float, quad_segs: int, join: str = "round", mitre_limit: float = 5.0):
    pieces = []
    seen_vertices = set()
    snap_tol = r * 1e-6
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        ring = _collapse_close_vertices(ring, snap_tol, closed=True)
        for i in range(len(ring) - 1):
            rect = segment_rectangle(ring[i], ring[i + 1], r)
            if rect is not None:
                pieces.append((rect, []))
        if join == "round":
            for v in ring[:-1]:
                key = (float(v[0]), float(v[1]))
                if key not in seen_vertices:
                    seen_vertices.add(key)
                    pieces.append((circle_ring(v[0], v[1], r, quad_segs), []))
        else:
            pieces.extend(
                _join_pieces(ring, r, quad_segs, join, mitre_limit, closed=True)
            )
    return pieces


def _line_pieces(coords: np.ndarray, r: float, quad_segs: int, join: str, mitre_limit: float, seen_vertices: set):
    """Stroke pieces (rects + joins/caps) for one open polyline; identical
    vertex circles are emitted ONCE across calls (the ``seen_vertices``
    set): a duplicate identical piece would cancel itself under the
    odd-even union parity — exactly what happens at a closed ring's
    closure vertex or a shared endpoint of two lines."""
    coords = _collapse_close_vertices(coords, r * 1e-6, closed=False)
    pieces = []
    for i in range(len(coords) - 1):
        rect = segment_rectangle(coords[i], coords[i + 1], r)
        if rect is not None:
            pieces.append((rect, []))
    if join == "round":
        verts = coords
    else:
        pieces.extend(_join_pieces(coords, r, quad_segs, join, mitre_limit, closed=False))
        verts = []
    for v in verts:
        key = (float(v[0]), float(v[1]))
        if key not in seen_vertices:
            seen_vertices.add(key)
            pieces.append((circle_ring(v[0], v[1], r, quad_segs), []))
    return pieces


def buffer_line(
    coords: np.ndarray,
    r: float,
    quad_segs: int = 8,
    join: str = "round",
    mitre_limit: float = 5.0,
):
    """Buffer of a polyline: list of (exterior, holes)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) == 0 or r <= 0:
        return []
    if len(coords) == 1:
        return [(circle_ring(coords[0, 0], coords[0, 1], r, quad_segs), [])]
    return unary_union(_line_pieces(coords, r, quad_segs, join, mitre_limit, set()))


def buffer_polygon(
    exterior,
    interiors=(),
    r: float = 1.0,
    quad_segs: int = 8,
    join: str = "round",
    mitre_limit: float = 5.0,
):
    """Positive r dilates, negative r erodes; list of (exterior, holes).

    ``join``: 'round' (vertex circles), 'mitre' (offset-line intersections,
    truncated past ``mitre_limit``·r) or 'bevel' — the reference's LineJoin
    styles (``geo/src/algorithm/buffer.rs:14-23``).
    """
    ext = np.asarray(exterior, dtype=np.float64)
    base = [(ext, [np.asarray(h, dtype=np.float64) for h in interiors])]
    if r == 0:
        return base
    if not len(list(interiors)):
        info = _convex_info(_collapse_close_vertices(ext, abs(r) * 1e-6, closed=True))
        if info is not None:
            pts, dn = info
            if r > 0:
                return _dilate_convex(pts, dn, r, quad_segs, join, mitre_limit)
            return _erode_convex(pts, dn, -r)
    rings = [ext] + [np.asarray(h, dtype=np.float64) for h in interiors]
    band = unary_union(_stroke_pieces(rings, abs(r), quad_segs, join, mitre_limit))
    if r > 0:
        return multipolygon_boolean_op(base, band, "union")
    return multipolygon_boolean_op(base, band, "difference")


def buffer_point(x: float, y: float, r: float, quad_segs: int = 8):
    if r <= 0:
        return []
    return [(circle_ring(x, y, r, quad_segs), [])]


def buffer_geometry(g, dist: float, quad_segs: int = 8, join: str = "round", mitre_limit: float = 5.0):
    """Buffer any (kind, data) geometry → [(exterior, holes)].

    JTS semantics: non-polygonal inputs with distance ≤ 0 → empty; polygon
    distance 0 is the identity (degenerate rings repair to empty).

    Conditioning: all arithmetic runs in a local frame translated to the
    geometry's (floor'd) bbox minimum — at raw coordinates of magnitude
    ~1e6 the overlay's float predicates degrade (measured: a union of two
    overlapping line buffers collapsed), while the same shapes at the
    origin union exactly. One shared shift keeps coincident vertex circles
    bitwise identical across members; outputs are shifted back.
    """
    import math

    def all_pts(gg):
        kind, data = gg
        if kind == "Point":
            return [np.asarray(data, float).reshape(1, 2)]
        if kind in ("MultiPoint", "LineString"):
            return [np.asarray(data, float).reshape(-1, 2)]
        if kind in ("MultiLineString", "Polygon"):
            return [np.asarray(l, float) for l in data]
        if kind == "MultiPolygon":
            return [np.asarray(r, float) for p in data for r in p]
        if kind == "GeometryCollection":
            return [a for m in data for a in all_pts(m)]
        raise ValueError(kind)

    def shift(gg, off):
        kind, data = gg
        if kind == "Point":
            return (kind, np.asarray(data, float) - off)
        if kind in ("MultiPoint", "LineString"):
            return (kind, np.asarray(data, float) - off)
        if kind in ("MultiLineString", "Polygon"):
            return (kind, [np.asarray(l, float) - off for l in data])
        if kind == "MultiPolygon":
            return (kind, [[np.asarray(r, float) - off for r in p] for p in data])
        if kind == "GeometryCollection":
            return (kind, [shift(m, off) for m in data])
        raise ValueError(kind)

    pts = all_pts(g)
    if not pts or all(len(a) == 0 for a in pts):
        return []
    mn = np.min(np.vstack([a for a in pts if len(a)]), axis=0)
    off = np.array([math.floor(mn[0]), math.floor(mn[1])], dtype=np.float64)
    out = _buffer_local(shift(g, off), dist, quad_segs, join, mitre_limit)
    return [
        (np.asarray(ext, float) + off, [np.asarray(h, float) + off for h in holes])
        for ext, holes in out
    ]


def _buffer_local(g, dist: float, quad_segs: int, join: str, mitre_limit: float):
    kind, data = g
    if kind == "GeometryCollection":
        pieces = []
        for m in data:
            pieces.extend(_buffer_local(m, dist, quad_segs, join, mitre_limit))
        return unary_union(pieces)
    if kind in ("Point", "MultiPoint"):
        if dist <= 0:
            return []
        pts = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        return unary_union(
            [(circle_ring(x, y, dist, quad_segs), []) for x, y in pts]
        )
    if kind in ("LineString", "MultiLineString"):
        if dist <= 0:
            return []
        lines = [data] if kind == "LineString" else list(data)
        # one piece-level union across all members (a union of per-member
        # RESULTS would feed the overlay pairs of shapes with identical
        # shared-vertex arcs — the piece set dedupes those instead)
        pieces = []
        seen: set = set()
        for l in lines:
            l = np.asarray(l, dtype=np.float64)
            if len(l) == 1:
                pieces.append((circle_ring(l[0, 0], l[0, 1], dist, quad_segs), []))
            elif len(l) >= 2:
                pieces.extend(
                    _line_pieces(l, dist, quad_segs, join, mitre_limit, seen)
                )
        return unary_union(pieces)
    if kind in ("Polygon", "MultiPolygon"):
        polys = [(data[0], data[1:])] if kind == "Polygon" else [
            (p[0], p[1:]) for p in data if len(p)
        ]
        if dist == 0:
            from geo_spark.kernels.repair import make_valid

            out = []
            for ext, holes in polys:
                out.extend(make_valid(ext, holes))
            return out
        out = []
        for ext, holes in polys:
            out.extend(
                buffer_polygon(ext, holes, dist, quad_segs, join, mitre_limit)
            )
        return unary_union(out) if len(polys) > 1 else out
    raise ValueError(f"unsupported buffer operand: {kind}")


# --- convex fast path ---------------------------------------------------------
#
# For a strictly convex, hole-free ring the stroke-union has a closed form:
# dilation boundary = offset edges + per-vertex join pieces assembled
# directly (the union of rects + vertex circles/wedges, traced analytically
# — SAME region as the overlay path, including the polygonal-circle chords
# and their end-cap crossing points), and erosion = the intersection of the
# inward-shifted edge half-planes. This skips the O(pieces²) overlay fold
# entirely; the general path below remains for every non-convex / holed
# input. Certified by parity pytests against the overlay path.

_CIRCLE_GRID_OFF = 0.3819660112501051e-6


def _convex_info(ring):
    """(ccw_open_pts, unit_edge_dirs) if strictly convex & closed, else None."""
    from geo_spark.kernels.area import ring_signed_area

    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 4 or (ring[0] != ring[-1]).any():
        return None
    pts = ring[:-1]
    if ring_signed_area(ring) < 0:
        pts = pts[::-1].copy()
    d = np.roll(pts, -1, axis=0) - pts
    L = np.hypot(d[:, 0], d[:, 1])
    if (L == 0.0).any():
        return None
    dn = d / L[:, None]
    nxt = np.roll(dn, -1, axis=0)
    cross = dn[:, 0] * nxt[:, 1] - dn[:, 1] * nxt[:, 0]
    if (cross <= 0.0).any():  # reflex or collinear joint → general path
        return None
    return pts, dn


def _dilate_convex(pts, dn, r, quad_segs, join, mitre_limit):
    """Offset boundary of a strictly convex CCW ring, vertex-parity with the
    rect∪circle∪wedge union of the overlay path."""
    n = len(pts)
    N = max(4 * quad_segs, 8)
    step = 2.0 * np.pi / N
    ang = (np.arange(N) + _CIRCLE_GRID_OFF) * step
    cir = np.column_stack([np.cos(ang), np.sin(ang)])
    normals = np.column_stack([dn[:, 1], -dn[:, 0]])  # outward for CCW
    out = []

    def cap_chord_cross(v, m_unit, pa, pb):
        # intersection of the end-cap ray x = v + t·m (t≥0) with chord pa→pb
        dp = pb - pa
        denom = dp[0] * m_unit[1] - dp[1] * m_unit[0]
        if denom == 0.0:
            return None
        u = ((v[0] - pa[0]) * m_unit[1] - (v[1] - pa[1]) * m_unit[0]) / denom
        return pa + u * dp

    for i in range(n):
        v = pts[i]
        d_prev, d_next = dn[i - 1], dn[i]
        m_prev, m_next = normals[i - 1], normals[i]
        T1 = v + m_prev * r
        T2 = v + m_next * r
        cross = d_prev[0] * d_next[1] - d_prev[1] * d_next[0]
        dot = float(d_prev @ d_next)
        kind = join
        if join != "round" and abs(cross) < 0.05 and dot > 0:
            kind = "round"  # same shallow-joint fallback as _mitre_wedge
        if kind == "round":
            a1 = float(np.arctan2(m_prev[1], m_prev[0])) % (2.0 * np.pi)
            span = float(np.arccos(np.clip(dot, -1.0, 1.0)))
            delta = (ang - a1) % (2.0 * np.pi)
            inside = np.flatnonzero((delta > 0) & (delta < span))
            out.append(T1)
            if len(inside):
                order = inside[np.argsort(delta[inside])]
                k1, k2 = order[0], order[-1]
                c1 = cap_chord_cross(v, m_prev, v + r * cir[k1 - 1], v + r * cir[k1])
                if c1 is not None:
                    out.append(c1)
                out.extend(v + r * cir[k] for k in order)
                c2 = cap_chord_cross(v, m_next, v + r * cir[k2], v + r * cir[(k2 + 1) % N])
                if c2 is not None:
                    out.append(c2)
            else:
                # whole turn inside one chord: both caps cross it
                k = int(((a1 - _CIRCLE_GRID_OFF * step) // step) % N)
                pa, pb = v + r * cir[k], v + r * cir[(k + 1) % N]
                c1 = cap_chord_cross(v, m_prev, pa, pb)
                c2 = cap_chord_cross(v, m_next, pa, pb)
                if c1 is not None:
                    out.append(c1)
                if c2 is not None:
                    out.append(c2)
            out.append(T2)
        elif kind == "mitre":
            denom = d_prev[0] * d_next[1] - d_prev[1] * d_next[0]
            rhs = T2 - T1
            t = (rhs[0] * d_next[1] - rhs[1] * d_next[0]) / denom
            m = T1 + t * d_prev
            out.append(T1)
            if float(np.hypot(m[0] - v[0], m[1] - v[1])) <= mitre_limit * r:
                out.append(m)
            out.append(T2)
        else:  # bevel
            out.append(T1)
            out.append(T2)

    ring = np.asarray(out, dtype=np.float64)
    # drop exact consecutive duplicates (tangent == circle vertex cases)
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = (ring[1:] != ring[:-1]).any(axis=1)
    ring = ring[keep]
    return [(np.vstack([ring, ring[:1]]), [])]


def _erode_convex(pts, dn, depth):
    """Erosion of a strictly convex CCW ring = intersection of the edge
    half-planes shifted inward by ``depth``; join style is irrelevant on the
    inward side."""
    from geo_spark.kernels.clip import _clip_half_plane

    normals = np.column_stack([dn[:, 1], -dn[:, 0]])
    cell = pts.copy()
    for i in range(len(pts)):
        if len(cell) < 3:
            return []
        v, m = pts[i], normals[i]

        def inside_mask(arr, v=v, m=m):
            return (arr[:, 0] - v[0]) * m[0] + (arr[:, 1] - v[1]) * m[1] <= -depth

        def isect(a, b, v=v, m=m):
            da = (a[0] - v[0]) * m[0] + (a[1] - v[1]) * m[1] + depth
            db = (b[0] - v[0]) * m[0] + (b[1] - v[1]) * m[1] + depth
            t = da / (da - db)
            return np.array([a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])])

        cell = _clip_half_plane(cell, inside_mask, isect)
    if len(cell) < 3:
        return []
    return [(np.vstack([cell, cell[:1]]), [])]
