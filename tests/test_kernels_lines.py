"""Parity tests for simplify / line / affine kernels (reference goldens)."""

import numpy as np
import pytest

from geo_spark.kernels import affine
from geo_spark.kernels.lines import (
    closest_point_on_line,
    densify,
    extremes,
    frechet_distance,
    hausdorff_distance,
    is_ring_convex,
    line_interpolate_point,
    line_intersection,
    line_locate_point,
    minimum_rotated_rect,
    segmentize,
    substring,
    sweep_intersections,
)
from geo_spark.kernels.simplify import (
    chaikin_smoothing,
    rdp,
    remove_repeated_points,
    visvalingam,
)


def _arr(pairs):
    return np.asarray(pairs, dtype=np.float64)


# --- RDP (simplify.rs:421-473) ------------------------------------------------

def test_rdp_recursion_golden():
    got = rdp(_arr([(8, 100), (9, 100), (12, 100)]), 1.0)
    assert np.array_equal(got, _arr([(8, 100), (12, 100)]))


def test_rdp_golden():
    inp = _arr([(0, 0), (5, 4), (11, 5.5), (17.3, 3.2), (27.8, 0.1)])
    exp = _arr([(0, 0), (5, 4), (11, 5.5), (27.8, 0.1)])
    assert np.array_equal(rdp(inp, 1.0), exp)


def test_rdp_edge_cases():
    assert len(rdp(_arr([]).reshape(0, 2), 1.0)) == 0
    one = _arr([(27.8, 0.1)])
    assert np.array_equal(rdp(one, 1.0), one)
    two = _arr([(0, 0), (27.8, 0.1)])
    assert np.array_equal(rdp(two, 1.0), two)
    # epsilon <= 0 → unchanged (simplify.rs:28-30)
    five = _arr([(0, 0), (1, 1), (2, 0), (3, 1), (4, 0)])
    assert np.array_equal(rdp(five, 0.0), five)


def test_rdp_ring_min_guard():
    # a ring must keep >= 4 coords (POLYGON_INITIAL_MIN)
    ring = _arr([(0, 0), (1, 0.01), (2, 0), (1, -0.01), (0, 0)])
    got = rdp(ring, 10.0, initial_min=4)
    assert len(got) >= 4


# --- Visvalingam (simplify_vw.rs PostGIS example) ------------------------------

def test_vw_postgis_golden():
    ls = _arr([(5, 2), (3, 8), (6, 20), (7, 25), (10, 10)])
    got = visvalingam(ls, 30.0)
    assert np.array_equal(got, _arr([(5, 2), (7, 25), (10, 10)]))


# --- line_intersection (line_intersection.rs doctests) -------------------------

def test_line_intersection_proper():
    r = line_intersection((0, 0), (5, 5), (0, 5), (5, 0))
    assert r == ("point", (2.5, 2.5), True)


def test_line_intersection_none():
    assert line_intersection((0, 0), (5, 5), (0, 1), (5, 6)) is None


def test_line_intersection_endpoint():
    r = line_intersection((0, 0), (5, 5), (5, 5), (5, 0))
    assert r == ("point", (5.0, 5.0), False)


def test_line_intersection_collinear_overlap():
    r = line_intersection((0, 0), (5, 5), (3, 3), (6, 6))
    assert r == ("collinear", ((3.0, 3.0), (5.0, 5.0)))


def test_sweep_matches_bruteforce():
    rng = np.random.RandomState(7)
    segs = rng.uniform(0, 10, (40, 4))
    got = {(i, j) for i, j, _ in sweep_intersections(segs)}
    brute = set()
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            if line_intersection(segs[i, :2], segs[i, 2:], segs[j, :2], segs[j, 2:]):
                brute.add((i, j))
    assert got == brute


# --- interpolation -------------------------------------------------------------

def test_interpolate_and_locate_roundtrip():
    line = _arr([(0, 0), (10, 0), (10, 10)])
    assert line_interpolate_point(line, 0.0) == (0.0, 0.0)
    assert line_interpolate_point(line, 0.5) == (10.0, 0.0)
    assert line_interpolate_point(line, 1.0) == (10.0, 10.0)
    assert line_interpolate_point(line, 0.25) == (5.0, 0.0)
    assert line_locate_point(line, 5.0, 0.0) == pytest.approx(0.25)
    assert line_locate_point(line, 10.0, 5.0) == pytest.approx(0.75)
    # off-line point projects
    assert line_locate_point(line, 5.0, 3.0) == pytest.approx(0.25)


def test_substring():
    line = _arr([(0, 0), (10, 0), (10, 10)])
    got = substring(line, 0.25, 0.75)
    assert np.array_equal(got, _arr([(5, 0), (10, 0), (10, 5)]))


def test_densify_and_segmentize():
    line = _arr([(0, 0), (10, 0)])
    got = densify(line, 3.0)
    assert len(got) == 5  # ceil(10/3)=4 splits → 5 points
    d = np.hypot(*np.diff(got, axis=0).T)
    assert (d <= 3.0 + 1e-12).all()
    seg = segmentize(line, 4)
    assert np.array_equal(seg, _arr([(0, 0), (2.5, 0), (5, 0), (7.5, 0), (10, 0)]))


# --- similarity ------------------------------------------------------------------

def test_frechet_simple():
    a = _arr([(0, 0), (1, 0), (2, 0)])
    b = _arr([(0, 1), (1, 1), (2, 1)])
    assert frechet_distance(a, b) == 1.0
    # reference doctest shape (frechet_distance.rs): dissimilar curves
    a = _arr([(0, 0), (100, 0)])
    b = _arr([(0, 50), (100, 50)])
    assert frechet_distance(a, b) == 50.0


def test_hausdorff():
    a = _arr([(0, 0), (1, 0)])
    b = _arr([(0, 0), (1, 5)])
    assert hausdorff_distance(a, b) == 5.0
    assert hausdorff_distance(a, a) == 0.0


def test_closest_point():
    line = _arr([(0, 0), (10, 0)])
    assert closest_point_on_line(line, 5.0, 3.0) == ("single", 5.0, 0.0)
    assert closest_point_on_line(line, 5.0, 0.0) == ("intersection", 5.0, 0.0)
    assert closest_point_on_line(line, -3.0, 4.0) == ("single", 0.0, 0.0)


# --- convexity / extremes / MRR -------------------------------------------------

def test_is_convex():
    square = _arr([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
    l_shape = _arr([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4), (0, 0)])
    assert is_ring_convex(square)
    assert not is_ring_convex(l_shape)
    collinear = _arr([(0, 0), (1, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
    assert is_ring_convex(collinear, allow_collinear=True)
    assert not is_ring_convex(collinear, allow_collinear=False)


def test_extremes():
    pts = _arr([(1, 5), (-3, 2), (7, -1), (0, 9)])
    assert extremes(pts) == (1, 2, 2, 3)


def test_minimum_rotated_rect():
    # tilted rectangle of points: MRR area == exact rect area
    base = _arr([(0, 0), (4, 0), (4, 2), (0, 2)])
    theta = np.radians(30)
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    pts = base @ rot.T
    mrr = minimum_rotated_rect(pts)
    from geo_spark.kernels.area import ring_signed_area

    assert abs(ring_signed_area(mrr)) == pytest.approx(8.0, rel=1e-9)


# --- chaikin / dedup ------------------------------------------------------------

def test_chaikin_open_preserves_endpoints():
    line = _arr([(0, 0), (4, 0), (4, 4)])
    got = chaikin_smoothing(line, 1)
    assert (got[0] == line[0]).all() and (got[-1] == line[-1]).all()
    assert len(got) > len(line)


def test_chaikin_ring_stays_closed():
    ring = _arr([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    got = chaikin_smoothing(ring, 2)
    assert (got[0] == got[-1]).all()


def test_remove_repeated_points():
    line = _arr([(0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (2, 2)])
    got = remove_repeated_points(line)
    assert np.array_equal(got, _arr([(0, 0), (1, 1), (2, 2)]))


# --- affine ----------------------------------------------------------------------

def test_affine_translate_rotate_scale():
    sq = _arr([(0, 0), (2, 0), (2, 2), (0, 2)])
    t = affine.apply(affine.translate(10, -5), sq)
    assert np.array_equal(t, sq + [10, -5])
    r = affine.apply(affine.rotate(90, origin=(1, 1)), sq)
    assert np.allclose(r, _arr([(2, 0), (2, 2), (0, 2), (0, 0)]), atol=1e-12)
    s = affine.apply(affine.scale(2, 3, origin=(0, 0)), sq)
    assert np.array_equal(s, sq * [2, 3])


def test_affine_compose_order():
    # compose(A, B) applies B first
    m = affine.compose(affine.translate(5, 0), affine.scale(2, 2))
    got = affine.apply(m, _arr([(1, 1)]))
    assert np.array_equal(got, _arr([(7, 2)]))  # scale → (2,2), then +5 → (7,2)


def test_vw_preserve_golden():
    # simplify_vw.rs simple_vwp_test: removal chain resolves self-intersection
    from geo_spark.kernels.simplify import visvalingam_preserve

    ls = _arr(
        [(10, 60), (135, 68), (94, 48), (126, 31), (280, 19), (117, 48), (300, 40), (301, 10)]
    )
    got = visvalingam_preserve(ls, 668.6)
    exp = _arr([(10, 60), (126, 31), (280, 19), (117, 48), (300, 40), (301, 10)])
    assert np.array_equal(got, exp)


def test_vw_preserve_no_op_below_threshold():
    from geo_spark.kernels.simplify import visvalingam_preserve

    ls = _arr([(0, 0), (10, 10), (20, 0), (30, 10), (40, 0)])
    got = visvalingam_preserve(ls, 1e-9)
    assert np.array_equal(got, ls)


# --- metric-parameterized densify / segmentize --------------------------------


def test_densify_haversine_reference_doctest():
    # densify.rs doctest: LINESTRING(0 0, 0 6, 1 7) @ 200 km haversine
    from geo_spark.kernels.lines import densify_metric

    ls = _arr([(0, 0), (0, 6), (1, 7)])
    got = densify_metric(ls, 200_000.0, "haversine")
    exp = _arr([(0, 0), (0, 1.5), (0, 3), (0, 4.5), (0, 6), (1, 7)])
    assert np.allclose(got, exp, atol=1e-14)


def test_densify_euclidean_reference_doctest():
    # densify.rs doctest: LINESTRING(0 0, 0 6, 1 7) @ max 2.0 euclidean
    from geo_spark.kernels.lines import densify_metric

    ls = _arr([(0, 0), (0, 6), (1, 7)])
    got = densify_metric(ls, 2.0, "euclidean")
    exp = _arr([(0, 0), (0, 2), (0, 4), (0, 6), (1, 7)])
    assert np.allclose(got, exp, atol=1e-12)


def test_densify_metric_piece_lengths_bounded():
    # every output piece must be <= max_segment_length in its own metric,
    # and the along-path length must be preserved (pieces of a segment lie
    # on the metric curve at equal spacing)
    from geo_spark.kernels.lines import densify_metric
    from geo_spark.kernels.measures import haversine_distance, rhumb_distance
    from geo_spark.kernels.geodesic import geodesic_inverse_batch

    ls = _arr([(-73.0, 40.0), (-10.0, 51.0), (2.0, 48.0)])
    for metric, pair in (
        ("haversine", lambda a, b: haversine_distance(a[:, 0], a[:, 1], b[:, 0], b[:, 1])),
        ("rhumb", lambda a, b: rhumb_distance(a[:, 0], a[:, 1], b[:, 0], b[:, 1])),
        ("geodesic", lambda a, b: geodesic_inverse_batch(a[:, 1], a[:, 0], b[:, 1], b[:, 0])[0]),
    ):
        got = densify_metric(ls, 250_000.0, metric)
        lens = np.asarray(pair(got[:-1], got[1:]))
        assert lens.max() <= 250_000.0 * (1 + 1e-9), metric
        orig = np.asarray(pair(ls[:-1], ls[1:])).sum()
        assert abs(lens.sum() - orig) / orig < 1e-9, metric


def test_segmentize_metric_equal_pieces():
    # pieces (with interior vertices) have identical along-path metric length
    from geo_spark.kernels.lines import segmentize_metric, segmentize_metric_pieces
    from geo_spark.kernels.measures import haversine_distance

    ls = _arr([(0, 0), (0, 6), (1, 7), (4, 9)])
    pieces = segmentize_metric_pieces(ls, 5, "haversine")
    assert len(pieces) == 5
    lens = np.array(
        [
            haversine_distance(p[:-1, 0], p[:-1, 1], p[1:, 0], p[1:, 1]).sum()
            for p in pieces
        ]
    )
    assert (lens.max() - lens.min()) / lens.mean() < 1e-12
    # pieces chain: piece[i] ends where piece[i+1] starts; ends preserved
    for i in range(4):
        assert np.array_equal(pieces[i][-1], pieces[i + 1][0])
    assert np.array_equal(pieces[0][0], ls[0])
    assert np.array_equal(pieces[-1][-1], ls[-1])
    # breakpoints variant agrees with the piece boundaries
    breaks = segmentize_metric(ls, 5, "haversine")
    got_breaks = np.array([p[0] for p in pieces] + [pieces[-1][-1]])
    assert np.allclose(breaks, got_breaks, atol=1e-12)


def test_densify_geodesic_matches_direct():
    # geodesic intermediates lie on the Karney geodesic: re-measuring each
    # piece with the inverse solution gives seg_len/n to sub-mm accuracy
    from geo_spark.kernels.lines import densify_metric
    from geo_spark.kernels.geodesic import geodesic_inverse_batch

    ls = _arr([(-73.0, 40.0), (2.3, 48.8)])  # ~5,850 km NYC->Paris
    got = densify_metric(ls, 1_000_000.0, "geodesic")
    total = geodesic_inverse_batch([40.0], [-73.0], [48.8], [2.3])[0][0]
    n = int(np.ceil(total / 1_000_000.0))
    assert len(got) == n + 1
    lens = geodesic_inverse_batch(got[:-1, 1], got[:-1, 0], got[1:, 1], got[1:, 0])[0]
    assert np.allclose(lens, total / n, atol=1e-3)


def test_line_interpolate_point_metric():
    from geo_spark.kernels.lines import line_interpolate_point_metric
    from geo_spark.kernels.measures import haversine_distance

    c = _arr([(0, 0), (0, 6), (1, 7)])
    # fraction 0.5 of total haversine length lies on the meridian segment
    p = line_interpolate_point_metric(c, 0.5, "haversine")
    assert abs(p[0]) < 1e-12
    d1 = haversine_distance(0.0, 0.0, p[0], p[1])
    total = (
        haversine_distance(0.0, 0.0, 0.0, 6.0)
        + haversine_distance(0.0, 6.0, 1.0, 7.0)
    )
    assert abs(d1 - total / 2) / total < 1e-12
    # endpoints and clamping
    assert line_interpolate_point_metric(c, 0.0, "geodesic") == (0.0, 0.0)
    assert line_interpolate_point_metric(c, 1.5, "euclidean") == (1.0, 7.0)
