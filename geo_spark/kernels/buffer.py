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


def _stroke_pieces(rings, r: float, quad_segs: int):
    pieces = []
    seen_vertices = set()
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        for i in range(len(ring) - 1):
            rect = segment_rectangle(ring[i], ring[i + 1], r)
            if rect is not None:
                pieces.append((rect, []))
        for v in ring[:-1]:
            key = (float(v[0]), float(v[1]))
            if key not in seen_vertices:
                seen_vertices.add(key)
                pieces.append((circle_ring(v[0], v[1], r, quad_segs), []))
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
