"""StitchTriangles — reassemble a triangulation into its multipolygon.

Parity: ``StitchTriangles`` (``geo/src/algorithm/stitch.rs:25``): given
non-overlapping triangles that share whole edges (exactly what the earcut /
Delaunay kernels emit), interior edges appear in two triangles and cancel;
the once-only edges are the boundary, traced into exterior rings and holes.
Uses the overlay's face assembler plus pinch splitting, so touch-at-a-vertex
outputs stay valid.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from geo_spark.kernels.area import ring_signed_area
from geo_spark.kernels.boolops import _assemble
from geo_spark.kernels.repair import _split_pinched


def stitch_triangles(triangles) -> list:
    """[(exterior, holes)] from a list of (3, 2) triangle arrays.

    Precondition (as the reference documents): triangles must not overlap
    and must meet along identical shared edges. Winding per triangle is
    normalized internally, so inputs of mixed orientation stitch fine.
    """
    edges = []
    for t in triangles:
        t = np.asarray(t, dtype=np.float64)[:3]
        ring = np.vstack([t, t[:1]])
        if ring_signed_area(ring) < 0:
            t = t[::-1]
        for k in range(3):
            a = (float(t[k, 0]), float(t[k, 1]))
            b = (float(t[(k + 1) % 3, 0]), float(t[(k + 1) % 3, 1]))
            if a != b:
                edges.append((a, b))
    cnt = Counter((a, b) if a <= b else (b, a) for a, b in edges)
    boundary = [e for e in edges if cnt[(e if e[0] <= e[1] else (e[1], e[0]))] == 1]
    return _split_pinched(_assemble(boundary))
