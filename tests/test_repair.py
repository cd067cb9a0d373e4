"""MakeValid repair — the reference's prepair doctest cases
(repair_polygon/mod.rs) plus the repaired-output-is-valid invariant.
"""

import numpy as np
import pytest

from geo_spark.kernels.boolops import overlay_area
from geo_spark.kernels.geom2 import validate_multipolygon
from geo_spark.kernels.repair import make_valid, make_valid_multipolygon


def _ring(*pts):
    return np.array(pts, dtype=np.float64)


def test_bowtie_splits_into_two_triangles():
    # repair_polygon/mod.rs doctest: boundary crosses at (5,5) → 2 components
    r = make_valid(_ring((0, 0), (0, 10), (10, 0), (10, 10), (0, 0)))
    assert len(r) == 2
    assert overlay_area(r) == pytest.approx(50.0, abs=1e-12)
    assert validate_multipolygon(r) == []


def test_dangling_edge_cancels():
    r = make_valid(_ring((0, 0), (10, 0), (15, 5), (10, 0), (10, 10), (0, 10), (0, 0)))
    assert len(r) == 1
    assert overlay_area(r) == pytest.approx(100.0, abs=1e-12)
    assert validate_multipolygon(r) == []


def test_hole_sharing_edge_with_shell():
    r = make_valid(
        _ring((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
        [_ring((5, 2), (5, 7), (10, 7), (10, 2), (5, 2))],
    )
    assert overlay_area(r) == pytest.approx(75.0, abs=1e-12)
    assert validate_multipolygon(r) == []


def test_hole_equal_to_shell_cancels_to_empty():
    ring = _ring((10, 90), (90, 90), (90, 10), (10, 10), (10, 90))
    assert make_valid(ring, [ring.copy()]) == []


def test_nested_shells_become_annulus():
    r = make_valid_multipolygon([
        (_ring((30, 70), (70, 70), (70, 30), (30, 30), (30, 70)), []),
        (_ring((10, 90), (90, 90), (90, 10), (10, 10), (10, 90)), []),
    ])
    assert overlay_area(r) == pytest.approx(4800.0, abs=1e-12)
    assert len(r) == 1 and len(r[0][1]) == 1  # one shell, one hole
    assert validate_multipolygon(r) == []


def test_banana_pinch_split():
    # hole touching the shell at one vertex: pinch-point split → valid
    r = make_valid(
        _ring((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
        [_ring((5, 0), (8, 3), (2, 3), (5, 0))],
    )
    assert overlay_area(r) == pytest.approx(91.0, abs=1e-12)
    assert validate_multipolygon(r) == []


def test_valid_input_is_unchanged():
    r = make_valid(
        _ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0)),
        [_ring((1, 1), (1, 2), (2, 2), (2, 1), (1, 1))],
    )
    assert len(r) == 1 and len(r[0][1]) == 1
    assert overlay_area(r) == pytest.approx(15.0, abs=1e-12)
    assert validate_multipolygon(r) == []


def test_repaired_outputs_always_validate():
    rng = np.random.RandomState(77)
    for _ in range(20):
        pts = rng.uniform(0, 10, (6, 2))  # random hexagon, usually invalid
        ring = np.vstack([pts, pts[:1]])
        r = make_valid(ring)
        assert validate_multipolygon(r) == [], ring.tolist()


def test_snap_round_collapses_slivers():
    from geo_spark.kernels.repair import snap_round_rings

    # sliver triangle: (10 10, 100 10, 10 11) at scale 1 collapses to a line
    r = snap_round_rings([_ring((10, 10), (100, 10), (10, 11), (10, 10))], 1.0)
    # hot-pixel routing bends the long edge through the (10,11)-adjacent
    # pixels; the remaining area is the thin stair — tiny, nearly collapsed
    assert overlay_area(r) <= 45.5  # exact sliver area was 45; snapped ≤
    # a hole collapsing onto itself produces shell + hole + nested island
    shell = _ring((9, 0), (0, 0), (0, 8), (9, 8), (9, 0))
    hole = _ring((2, 1), (3.1, 1), (4, 6), (7, 5), (7, 3), (3.4, 2.2), (4, 1),
                 (8, 1), (8, 7), (2, 7), (2, 1))
    r = snap_round_rings([shell, hole], 1.0)
    assert overlay_area(r) == pytest.approx(47.0)
    assert len(r) == 2  # shell-with-hole + island
    assert validate_multipolygon(r) == []
    # snapping an already-on-grid valid polygon is the identity (area-wise)
    r = snap_round_rings([_ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0))], 1.0)
    assert overlay_area(r) == pytest.approx(16.0)


def test_snap_round_output_vertices_on_grid():
    from geo_spark.kernels.repair import snap_round_rings

    # adversarial near-coincident bundle: many long skinny triangles whose
    # routed edges cross at off-grid points after one pass — the iterated
    # { node → snap → re-route } loop must leave every vertex on the grid
    rings = [
        _ring((0, 0), (37, 1 + 0.13 * k), (0, 2 + 0.11 * k), (0, 0))
        for k in range(7)
    ] + [_ring((5, -3), (11, 9.01), (17.02, -2.98), (5, -3))]
    for scale in (1.0, 2.0):
        out = snap_round_rings(rings, scale)
        for poly in out:
            for ring in [poly[0]] + list(poly[1]):
                arr = np.asarray(ring, dtype=float) * scale
                assert np.allclose(arr, np.round(arr), atol=0), (
                    "off-grid vertex after snap rounding"
                )
