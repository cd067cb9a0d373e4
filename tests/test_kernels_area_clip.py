"""Area / centroid / clip kernel tests (reference doctest shapes)."""

import numpy as np
import pytest

from geo_spark.kernels import (
    bounding_rect,
    clip_ring_to_rect,
    polygon_centroid,
    polygon_signed_area,
    polygon_unsigned_area,
    rect_clip_area,
    ring_is_ccw,
    ring_signed_area,
)
from geo_spark.kernels.area import euclidean_length, linestring_centroid
from geo_spark.kernels.clip import rect_intersection, rect_union_bounds


def _ring(pairs):
    return np.asarray(pairs, dtype=np.float64)


RECT_5X6 = _ring([(0, 0), (5, 0), (5, 6), (0, 6), (0, 0)])


def test_signed_area_doctest():
    # area.rs doctest: 5x6 CCW rect → +30; reversed → -30
    assert polygon_signed_area(RECT_5X6) == 30.0
    assert polygon_signed_area(RECT_5X6[::-1]) == -30.0
    assert polygon_unsigned_area(RECT_5X6[::-1]) == 30.0


def test_area_with_hole():
    outer = _ring([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    hole = _ring([(2, 2), (2, 4), (4, 4), (4, 2), (2, 2)])  # CW hole
    assert polygon_signed_area(outer, [hole]) == 100.0 - 4.0
    # sign follows exterior even with oddly-wound holes (area.rs:136-158)
    assert polygon_signed_area(outer[::-1], [hole]) == -(100.0 - 4.0)


def test_area_first_coord_shift_stability():
    # far-from-origin unit square: naive shoelace loses precision, the
    # shifted formulation (area.rs:23-52) must stay exact
    base = 1e9
    sq = _ring(
        [(base, base), (base + 1, base), (base + 1, base + 1), (base, base + 1), (base, base)]
    )
    assert ring_signed_area(sq) == 1.0


def test_winding():
    assert ring_is_ccw(RECT_5X6)
    assert not ring_is_ccw(RECT_5X6[::-1])


def test_centroid_rect():
    cx, cy = polygon_centroid(RECT_5X6)
    assert (cx, cy) == (2.5, 3.0)


def test_centroid_with_hole():
    outer = _ring([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    hole = _ring([(0, 0), (0, 2), (2, 2), (2, 0), (0, 0)])  # bottom-left quarter
    cx, cy = polygon_centroid(outer, [hole])
    # centroid of an L (full square minus bottom-left quarter)
    assert cx == pytest.approx(7.0 / 3.0)
    assert cy == pytest.approx(7.0 / 3.0)


def test_line_centroid_length_weighted():
    # centroid.rs:90-110 — length-weighted midpoints
    line = _ring([(0, 0), (2, 0), (2, 1)])
    cx, cy = linestring_centroid(line)
    assert cx == pytest.approx((1.0 * 2 + 2.0 * 1) / 3)
    assert cy == pytest.approx((0.0 * 2 + 0.5 * 1) / 3)
    assert euclidean_length(line) == 3.0


def test_bounding_rect():
    assert bounding_rect(RECT_5X6) == (0.0, 0.0, 5.0, 6.0)


def test_clip_two_overlapping_squares():
    # bool_ops/mod.rs:86-90 doctest shape: two 10x10 squares overlapping by 5
    subject = _ring([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    clipped = clip_ring_to_rect(subject, 5, 5, 15, 15)
    assert abs(ring_signed_area(clipped)) == 25.0
    assert rect_clip_area(subject, 5, 5, 15, 15) == 25.0


def test_clip_disjoint_and_contained():
    subject = _ring([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
    assert rect_clip_area(subject, 5, 5, 9, 9) == 0.0
    assert rect_clip_area(subject, -1, -1, 3, 3) == 4.0  # fully inside window
    assert rect_clip_area(subject, 0, 0, 2, 2) == 4.0  # window == subject


def test_clip_concave():
    # L-shape clipped to a window covering its notch
    l_shape = _ring([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4), (0, 0)])
    # window over the top-right quadrant [1,4]x[1,4]: L has nothing there
    assert rect_clip_area(l_shape, 1, 1, 4, 4) == 0.0
    # window over the bottom arm
    assert rect_clip_area(l_shape, 0, 0, 4, 1) == 4.0


def test_rect_ops():
    assert rect_intersection((0, 0, 4, 4), (2, 2, 6, 6)) == (2, 2, 4, 4)
    assert rect_intersection((0, 0, 1, 1), (2, 2, 3, 3)) is None
    assert rect_union_bounds((0, 0, 1, 1), (2, 2, 3, 3)) == (0, 0, 3, 3)
