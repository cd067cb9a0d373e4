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
    """Polygonal circle on the absolute angle grid (same center → same ring)."""
    n = max(4 * quad_segs, 8)
    ang = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
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


def _mitre_wedge(u, v, w, r: float, mitre_limit: float, bevel_only: bool):
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
    if cross == 0.0:
        return None
    if cross > 0:  # left turn → gap on the right side
        n1 = np.array([d1[1], -d1[0]])
        n2 = np.array([d2[1], -d2[0]])
    else:  # right turn → gap on the left side
        n1 = np.array([-d1[1], d1[0]])
        n2 = np.array([-d2[1], d2[0]])
    p1 = v + n1 * r
    p2 = v + n2 * r
    if not bevel_only:
        # offset-line intersection: p1 + t·d1 == p2 + s·d2
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        rhs = p2 - p1
        t = (rhs[0] * d2[1] - rhs[1] * d2[0]) / denom
        m = p1 + t * d1
        if float(np.hypot(m[0] - v[0], m[1] - v[1])) <= mitre_limit * r:
            ring = np.array([v, p1, m, p2, v], dtype=np.float64)
            return ring
    ring = np.array([v, p1, p2, v], dtype=np.float64)
    return ring


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
                r, mitre_limit, bevel_only,
            )
            if wedge is not None:
                pieces.append((wedge, []))
    else:
        for i in range(1, n - 1):
            wedge = _mitre_wedge(
                np.asarray(ring[i - 1], float),
                np.asarray(ring[i], float),
                np.asarray(ring[i + 1], float),
                r, mitre_limit, bevel_only,
            )
            if wedge is not None:
                pieces.append((wedge, []))
        # flat (butt→square) caps for non-round joins: JTS mitre buffers use
        # square caps only via cap style; the corpus only erodes polygons,
        # so open-line caps keep the round default
        for v in (ring[0], ring[-1]):
            pieces.append((circle_ring(v[0], v[1], r, quad_segs), []))
    return pieces


def _stroke_pieces(rings, r: float, quad_segs: int, join: str = "round", mitre_limit: float = 5.0):
    pieces = []
    seen_vertices = set()
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
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


def buffer_line(coords: np.ndarray, r: float, quad_segs: int = 8):
    """Buffer of a polyline: list of (exterior, holes)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) == 0 or r <= 0:
        return []
    if len(coords) == 1:
        return [(circle_ring(coords[0, 0], coords[0, 1], r, quad_segs), [])]
    pieces = []
    for i in range(len(coords) - 1):
        rect = segment_rectangle(coords[i], coords[i + 1], r)
        if rect is not None:
            pieces.append((rect, []))
    for v in coords:
        pieces.append((circle_ring(v[0], v[1], r, quad_segs), []))
    return unary_union(pieces)


def buffer_polygon(exterior, interiors=(), r: float = 1.0, quad_segs: int = 8):
    """Positive r dilates, negative r erodes; list of (exterior, holes)."""
    ext = np.asarray(exterior, dtype=np.float64)
    base = [(ext, [np.asarray(h, dtype=np.float64) for h in interiors])]
    if r == 0:
        return base
    rings = [ext] + [np.asarray(h, dtype=np.float64) for h in interiors]
    band = unary_union(_stroke_pieces(rings, abs(r), quad_segs))
    if r > 0:
        return multipolygon_boolean_op(base, band, "union")
    return multipolygon_boolean_op(base, band, "difference")


def buffer_point(x: float, y: float, r: float, quad_segs: int = 8):
    if r <= 0:
        return []
    return [(circle_ring(x, y, r, quad_segs), [])]
