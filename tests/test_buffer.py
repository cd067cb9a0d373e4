"""Buffer construction tests (area-formula properties)."""

import numpy as np
import pytest

from geo_spark.kernels.boolops import overlay_area
from geo_spark.kernels.buffer import buffer_line, buffer_point, buffer_polygon


def _circle_area(r):
    return np.pi * r * r


def test_point_buffer_area():
    r, qs = 3.0, 8
    got = overlay_area(buffer_point(0, 0, r, qs))
    n = 4 * qs
    inscribed = 0.5 * n * r * r * np.sin(2 * np.pi / n)
    assert got == pytest.approx(inscribed, rel=1e-12)


def test_line_buffer_area():
    r, qs = 1.0, 16
    line = np.array([(0.0, 0.0), (10.0, 0.0)])
    got = overlay_area(buffer_line(line, r, qs))
    exp = 2 * r * 10.0 + _circle_area(r)
    assert got == pytest.approx(exp, rel=0.01)
    # right-angle polyline: joint overlap reduces area below naive sum
    bent = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)])
    got2 = overlay_area(buffer_line(bent, r, qs))
    exp2 = 2 * r * 20.0 + _circle_area(r) * 0.75 + _circle_area(r) * 0.5 - 0.0
    # loose sanity bounds: between rectangles-only and naive sum
    assert 2 * r * 20.0 < got2 < 2 * (2 * r * 10.0 + _circle_area(r))


def test_polygon_buffer_dilate_erode():
    sq = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
    r, qs = 1.0, 8
    dilated = buffer_polygon(sq, (), r, qs)
    exp = 100.0 + 40.0 * r + _circle_area(r)
    assert overlay_area(dilated) == pytest.approx(exp, rel=0.01)
    eroded = buffer_polygon(sq, (), -r, qs)
    assert overlay_area(eroded) == pytest.approx(64.0, rel=0.01)
    gone = buffer_polygon(sq, (), -6.0, qs)
    assert overlay_area(gone) == pytest.approx(0.0, abs=1e-6)


def test_polygon_buffer_with_hole():
    outer = np.array([(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0), (0.0, 0.0)])
    hole = np.array([(8.0, 8.0), (8.0, 12.0), (12.0, 12.0), (12.0, 8.0), (8.0, 8.0)])
    r = 1.0
    dil = buffer_polygon(outer, [hole], r, 8)
    # hole shrinks by r on each side: 4x4 → 2x2 minus rounded corners
    base = 400.0 - 16.0
    exp_outer_gain = 80.0 * r + _circle_area(r)
    exp_hole_fill = 16.0 - 4.0  # hole area shrinks to ~2x2 (+ rounded corners)
    got = overlay_area(dil)
    assert got == pytest.approx(base + exp_outer_gain + exp_hole_fill, rel=0.02)


def test_mitre_and_bevel_joins_square():
    import numpy as np

    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.buffer import buffer_polygon

    sq = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], float)
    # mitre dilation of a square is the exact bigger square
    out = buffer_polygon(sq, [], 2.0, join="mitre")
    assert len(out) == 1
    assert abs(abs(ring_signed_area(np.asarray(out[0][0]))) - 14 * 14) < 1e-9
    # mitre erosion is the exact smaller square
    out = buffer_polygon(sq, [], -2.0, join="mitre")
    assert abs(abs(ring_signed_area(np.asarray(out[0][0]))) - 6 * 6) < 1e-9
    # bevel dilation cuts each corner: (s+2r)^2 - 2r^2
    out = buffer_polygon(sq, [], 2.0, join="bevel")
    assert abs(abs(ring_signed_area(np.asarray(out[0][0]))) - (196 - 8)) < 1e-9
    # round dilation: corners are quarter 32-gons
    out = buffer_polygon(sq, [], 2.0, join="round")
    a32 = 0.5 * 32 * 4.0 * np.sin(2 * np.pi / 32)  # inscribed 32-gon area
    assert abs(abs(ring_signed_area(np.asarray(out[0][0]))) - (100 + 4 * 10 * 2 + a32)) < 1e-6


def test_mitre_limit_falls_back_to_bevel():
    import numpy as np

    from geo_spark.kernels.buffer import _mitre_wedge

    # a sharp spike: mitre point would be ~11.5r away; limit 5 → bevel (4-pt ring)
    u = np.array([0.0, 0.0]); v = np.array([10.0, 0.0]); w = np.array([0.0, 1.0])
    ring = _mitre_wedge(u, v, w, 1.0, 5.0, bevel_only=False)
    assert ring is not None and len(ring) == 4  # bevel triangle (closed)
    # gentle corner stays a mitre quad
    w2 = np.array([10.0, 10.0])
    ring = _mitre_wedge(u, v, w2, 1.0, 5.0, bevel_only=False)
    assert ring is not None and len(ring) == 5


def test_buffer_geometry_large_coordinates():
    # the local-frame conditioning: union of overlapping line buffers at
    # ~1.3e6 magnitude coordinates must merge into one piece
    import numpy as np

    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.buffer import buffer_geometry

    g = (
        "MultiLineString",
        [
            np.array([(1335558.59, 631743.01), (1335572.28, 631775.89)], float),
            np.array([(1335572.28, 631775.89), (1335576.62, 631803.90)], float),
        ],
    )
    out = buffer_geometry(g, 10.0)
    assert len(out) == 1
    # closed ring (LinearRing) buffer keeps its interior hole
    ring = ("LineString", np.array([(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)], float))
    out = buffer_geometry(ring, 1.0)
    assert len(out) == 1 and len(out[0][1]) == 1  # annulus: one hole


def test_convex_fast_path_matches_overlay():
    # the convex fast path (analytic stroke-union boundary / half-plane
    # erosion) must produce the same region as the general overlay fold
    import geo_spark.kernels.buffer as B
    from geo_spark.kernels.area import ring_signed_area
    from geo_spark.kernels.hull import quick_hull

    def area_of(result):
        tot = 0.0
        for ext, holes in result:
            tot += abs(ring_signed_area(np.asarray(ext)))
            for h in holes:
                tot -= abs(ring_signed_area(np.asarray(h)))
        return tot

    def overlay_path(ring, r, join):
        base = [(ring, [])]
        band = B.unary_union(B._stroke_pieces([ring], abs(r), 8, join, 5.0))
        op = "union" if r > 0 else "difference"
        return B.multipolygon_boolean_op(base, band, op)

    rng = np.random.RandomState(1)
    for _ in range(8):
        h = quick_hull(rng.uniform(-5, 5, (10, 2)))
        ring = np.vstack([h, h[:1]]) if (h[0] != h[-1]).any() else np.asarray(h)
        assert B._convex_info(ring) is not None
        for join in ("round", "mitre", "bevel"):
            for r in (0.6, -0.3):
                fast = B.buffer_polygon(ring, (), r, 8, join)
                slow = overlay_path(ring, r, join)
                assert abs(area_of(fast) - area_of(slow)) < 1e-9 * max(1.0, area_of(slow)), (join, r)


def test_convex_fast_path_rejects_nonconvex():
    import geo_spark.kernels.buffer as B

    star = np.array(
        [(0, 0), (4, 1), (8, 0), (5, 3), (8, 6), (4, 5), (0, 6), (3, 3), (0, 0)],
        dtype=float,
    )
    assert B._convex_info(star) is None
    # collinear joint also routes to the general path
    sq_collin = np.array([(0, 0), (1, 0), (2, 0), (2, 2), (0, 2), (0, 0)], dtype=float)
    assert B._convex_info(sq_collin) is None
