"""Polygonize: assemble polygons (with holes) from linework.

Parity target: JTS Polygonizer as exercised by the reference's conformance
corpus (``jts-test-runner/resources/testxml/general/TestPolygonize.xml``;
the reference's own runner does not parse the op — ``input.rs:290-475`` —
so this is parity-plus). Semantics:

1. dangles (edges with a free endpoint) peel off iteratively;
2. the remaining planar graph decomposes into faces by the left-face
   traversal rule (at each node take the next edge clockwise from the
   arrival twin);
3. bridges / cut edges (an edge and its twin on the same face) are removed
   and the decomposition repeats;
4. positive-area faces are shells; negative cycles (each component's outer
   contour and annulus inner boundaries) become holes of the smallest
   shell STRICTLY containing them — a cycle over its own twin ring (all
   vertices on the boundary) never qualifies, so a closed ring yields both
   a standalone polygon and a hole of any surrounding shell, exactly as
   JTS emits them.

Input must be noded (JTS Polygonizer's own precondition).
"""

from __future__ import annotations

import math
from bisect import bisect_left

import numpy as np


def _ring_area(cycle) -> float:
    a = 0.0
    n = len(cycle)
    for i in range(n):
        x1, y1 = cycle[i]
        x2, y2 = cycle[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return a / 2.0


def _faces(edges):
    """Decompose directed edges into boundary cycles (left-face rule).

    ``edges``: set of directed (u, v) node-coordinate pairs, twin-closed.
    Returns list of cycles, each a list of nodes [u0, u1, ...] (closed
    implicitly).
    """
    out_by_node: dict = {}
    for (u, v) in edges:
        ang = math.atan2(v[1] - u[1], v[0] - u[0])
        out_by_node.setdefault(u, []).append((ang, v))
    for u in out_by_node:
        out_by_node[u].sort()

    unused = set(edges)
    faces = []
    while unused:
        e = next(iter(unused))
        cycle = []
        cur = e
        while True:
            unused.discard(cur)
            u, v = cur
            cycle.append(u)
            back = math.atan2(u[1] - v[1], u[0] - v[0])
            outs = out_by_node[v]
            angs = [a for a, _ in outs]
            # next edge clockwise from the arrival twin: largest angle < back
            i = bisect_left(angs, back) - 1
            nxt = (v, outs[i][1])
            if nxt == e:
                break
            cur = nxt
        faces.append(cycle)
    return faces


def polygonize(segments):
    """[(exterior, holes)] from an iterable of ((x1,y1),(x2,y2)) segments.

    Exteriors CCW, holes CW, every ring closed; coordinates pass through
    exactly (no snapping).
    """
    segs = set()
    for a, b in segments:
        a = (float(a[0]), float(a[1]))
        b = (float(b[0]), float(b[1]))
        if a != b:
            segs.add((a, b) if a <= b else (b, a))

    while True:
        # 1. peel dangles
        while True:
            deg: dict = {}
            for a, b in segs:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {s for s in segs if deg[s[0]] == 1 or deg[s[1]] == 1}
            if not drop:
                break
            segs -= drop
        if not segs:
            return []

        edges = set()
        for a, b in segs:
            edges.add((a, b))
            edges.add((b, a))
        faces = _faces(edges)

        # 2. bridges: edge and twin in the same face → cut edge; remove, redo
        bridges = set()
        for cycle in faces:
            seen = set()
            n = len(cycle)
            for i in range(n):
                u, v = cycle[i], cycle[(i + 1) % n]
                key = (u, v) if u <= v else (v, u)
                if key in seen:
                    bridges.add(key)
                seen.add(key)
        if not bridges:
            break
        segs -= bridges

    shells = []
    holes = []
    for cycle in faces:
        a = _ring_area(cycle)
        if a > 0:
            shells.append((np.asarray(cycle + [cycle[0]], dtype=np.float64), a))
        elif a < 0:
            holes.append((np.asarray(cycle + [cycle[0]], dtype=np.float64), -a))

    from geo_spark.kernels.predicates import polygon_position

    sboxes = [
        (s[:-1, 0].min(), s[:-1, 1].min(), s[:-1, 0].max(), s[:-1, 1].max())
        for s, _ in shells
    ]
    assigned: dict = {i: [] for i in range(len(shells))}
    for hring, _ in holes:
        best = None
        hx, hy = hring[:-1, 0], hring[:-1, 1]
        hbox = (hx.min(), hy.min(), hx.max(), hy.max())
        for i, (sring, sarea) in enumerate(shells):
            sb = sboxes[i]
            # bbox prefilter: a containing shell's bbox must cover the hole's
            if hbox[0] < sb[0] or hbox[1] < sb[1] or hbox[2] > sb[2] or hbox[3] > sb[3]:
                continue
            if best is not None and shells[best][1] <= sarea:
                continue
            pos = polygon_position(hx, hy, sring)
            if (pos >= 0).all() and (pos > 0).any():
                best = i
        if best is not None:
            assigned[best].append(hring)
    return [(sring, assigned[i]) for i, (sring, sarea) in enumerate(shells)]
