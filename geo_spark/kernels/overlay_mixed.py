"""Heterogeneous (mixed-dimension) overlay — point-set boolean operations
over ANY pair of geometries, producing the JTS OverlayNG result shape:
2-D polygon pieces + 1-D collapsed/residual line pieces + 0-D touch points,
with lower-dimensional redundancy absorbed by higher-dimensional pieces.

This is the engine's general `GeometryCollection`-capable overlay: the
polygon×polygon / line×line special cases remain the fast paths
(kernels/boolops.py, relate2 noding); this module composes them for
arbitrary operand dimensions. Certified against the JTS conformance corpus
(every floating-precision mixed-dimension overlay/unary-union case passes —
tools/jts_runner.py routes them here).

Ops: 'intersection' | 'union' | 'difference' | 'symdifference'.
Returns (points:set[(x,y)], segs:list[((x,y),(x,y))], polys:list[(ext,holes)]).
"""

from __future__ import annotations

import numpy as np


def _dedupe_segs(segs):
    """Undirected dedupe: each 1-D location once."""
    seen = set()
    out = []
    for a, b in segs:
        a = (float(a[0]), float(a[1]))
        b = (float(b[0]), float(b[1]))
        key = (a, b) if a <= b else (b, a)
        if key not in seen and a != b:
            seen.add(key)
            out.append((a, b))
    return out


def mixed_overlay(ga, gb, base):
    """Heterogeneous overlay: point-set semantics over mixed-dimension
    operands (JTS OverlayNG result shape). Returns (pts:set, segs:list,
    polys:list) — each dimension's pieces with lower-dimensional redundancy
    removed (pieces covered by a higher-dimensional result piece are
    absorbed, as in JTS result collections).
    """
    from geo_spark.kernels.boolops import multipolygon_boolean_op, unary_union
    from geo_spark.kernels.relate2 import (
        E as RE,
        _cls_vs_polys,
        _on_segs,
        _segs_of_lines,
        _segs_of_polys,
        components,
        node_pieces,
    )

    a_pts, a_lines, a_polys = components(ga)
    b_pts, b_lines, b_polys = components(gb) if gb is not None else ([], [], [])

    # --- 2-D part -----------------------------------------------------------
    if base == "intersection":
        polys = (
            multipolygon_boolean_op(a_polys, b_polys, "intersection")
            if a_polys and b_polys
            else []
        )
    elif base == "union":
        polys = unary_union(list(a_polys) + list(b_polys))
    elif base == "difference":
        polys = (
            multipolygon_boolean_op(a_polys, b_polys, "difference")
            if b_polys
            else list(a_polys)
        )
    else:  # symdifference
        polys = (
            multipolygon_boolean_op(a_polys, b_polys, "xor")
            if a_polys and b_polys
            else unary_union(list(a_polys) + list(b_polys))
        )

    def pos_closure(p, pts, lines, polys_):
        """True iff p is in the closure of the (pts, lines, polys) set."""
        if polys_ and _cls_vs_polys(p, polys_) != RE:
            return True
        if lines and _on_segs(p, _segs_of_lines(lines)):
            return True
        return tuple(p) in {tuple(q) for q in pts}

    def covered_by_result_polys(p):
        return bool(polys) and _cls_vs_polys(p, polys) != RE

    # --- 1-D part -----------------------------------------------------------
    segs = []

    def cat_segs(*parts):
        arrs = [np.asarray(p, dtype=np.float64).reshape(-1, 4) for p in parts]
        arrs = [a for a in arrs if len(a)]
        return np.vstack(arrs) if arrs else np.empty((0, 4))

    other_b = cat_segs(
        _segs_of_lines(b_lines) if b_lines else np.empty((0, 4)),
        _segs_of_polys(b_polys) if b_polys else np.empty((0, 4)),
    )
    other_a = cat_segs(
        _segs_of_lines(a_lines) if a_lines else np.empty((0, 4)),
        _segs_of_polys(a_polys) if a_polys else np.empty((0, 4)),
    )

    def line_pieces(lines, other_segs, other_closure):
        """(covered, uncovered) noded pieces of ``lines`` vs the other
        operand's closure."""
        if not lines:
            return [], []
        pieces, _ = node_pieces(lines, other_segs)
        cov, unc = [], []
        for a, b, on in pieces:
            mid = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
            if on or other_closure(mid):
                cov.append((a, b))
            else:
                unc.append((a, b))
        return cov, unc

    in_b = lambda p: pos_closure(p, b_pts, b_lines, b_polys)  # noqa: E731
    in_a = lambda p: pos_closure(p, a_pts, a_lines, a_polys)  # noqa: E731
    cov_a, unc_a = line_pieces(a_lines, other_b, in_b)
    cov_b, unc_b = line_pieces(b_lines, other_a, in_a)
    if base == "intersection":
        segs.extend(cov_a + cov_b)
        # collinear boundary∩boundary collapse pieces (poly×poly)
        if a_polys and b_polys:
            ringsA = [r for ext, holes in a_polys for r in [ext] + list(holes)]
            piecesR, _ = node_pieces(ringsA, _segs_of_polys(b_polys))
            for a, b, on in piecesR:
                if on:
                    segs.append((a, b))
    elif base == "union":
        # all of A's noded line pieces + B pieces outside closure(A): a B
        # piece on A's lines is the same 1-D location as a cov_a piece, and
        # one inside A's polygons is absorbed by the result area
        segs.extend(cov_a + unc_a + unc_b)
    elif base == "difference":
        segs.extend(unc_a)
        # boundary collapse: a ∂A piece survives A−B as a LINE when it is
        # outside every result polygon (so the A-interior strip next to it
        # was eaten by B) while the piece itself is not in int(B) — i.e.
        # collinear with ∂B or outside B entirely
        if a_polys and b_polys:
            from geo_spark.kernels.relate2 import I as RI

            ringsA = [r for ext, holes in a_polys for r in [ext] + list(holes)]
            piecesR, _ = node_pieces(ringsA, _segs_of_polys(b_polys))
            for a, b, on in piecesR:
                mid = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
                if covered_by_result_polys(mid):
                    continue
                if on or _cls_vs_polys(mid, b_polys) != RI:
                    segs.append((a, b))
    else:  # symdifference
        segs.extend(unc_a + unc_b)

    # self-node the collected pieces: partially-overlapping collinear pieces
    # (an operand's own out-and-back traversal) must collapse to one
    # location before dedupe, or lengths double-count
    if len(segs) > 1:
        seg_arr0 = np.asarray(
            [(s[0][0], s[0][1], s[1][0], s[1][1]) for s in segs], dtype=np.float64
        )
        seg_lines = [np.asarray([s[0], s[1]], dtype=np.float64) for s in segs]
        pieces2, _ = node_pieces(seg_lines, seg_arr0)
        segs = [(a, b) for a, b, _ in pieces2]

    # drop line pieces absorbed by result polygons
    segs = [
        s
        for s in _dedupe_segs(segs)
        if not covered_by_result_polys(
            ((s[0][0] + s[1][0]) / 2, (s[0][1] + s[1][1]) / 2)
        )
    ]

    # --- 0-D part -----------------------------------------------------------
    pts = set()
    A0 = {(float(p[0]), float(p[1])) for p in a_pts}
    B0 = {(float(p[0]), float(p[1])) for p in b_pts}
    if base == "intersection":
        pts |= {p for p in A0 if in_b(p)}
        pts |= {p for p in B0 if in_a(p)}
        # isolated crossing/touch points of the 1-D/boundary networks
        all_a = a_lines + [r for ext, holes in a_polys for r in [ext] + list(holes)]
        if all_a and (b_lines or b_polys):
            _, nodes = node_pieces(all_a, other_b)
            for p in nodes:
                q = (float(p[0]), float(p[1]))
                if in_a(q) and in_b(q):
                    pts.add(q)
    elif base == "union":
        pts |= A0 | B0
    elif base == "difference":
        pts |= {p for p in A0 if not in_b(p)}
    else:
        pts |= {p for p in A0 if not in_b(p)}
        pts |= {p for p in B0 if not in_a(p)}

    seg_arr = (
        np.asarray([(s[0][0], s[0][1], s[1][0], s[1][1]) for s in segs], dtype=np.float64)
        if segs
        else None
    )
    pts = {
        p
        for p in pts
        if not covered_by_result_polys(p)
        and not (seg_arr is not None and _on_segs(p, seg_arr))
    }
    return pts, segs, polys


