"""DE-9IM point relates + compound intersects (cases per intersects/mod.rs)."""

import numpy as np

from geo_spark.kernels.relate import (
    de9im_matches,
    is_contains,
    is_covers,
    is_intersects,
    is_within,
    linestring_intersects_polygon,
    linestrings_intersect,
    polygons_intersect,
    relate_point_linestring,
    relate_point_point,
    relate_point_polygon,
)

SQUARE = np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=np.float64)
HOLE = np.asarray([(1, 1), (1, 3), (3, 3), (3, 1), (1, 1)], dtype=np.float64)


def test_point_polygon_matrices():
    assert relate_point_polygon(2, 2, SQUARE) == "0FFFFF212"
    assert relate_point_polygon(0, 2, SQUARE) == "F0FFFF212"
    assert relate_point_polygon(9, 9, SQUARE) == "FF0FFF212"
    # in-hole → exterior
    assert relate_point_polygon(2, 2, SQUARE, [HOLE]) == "FF0FFF212"
    assert relate_point_polygon(1, 2, SQUARE, [HOLE]) == "F0FFFF212"


def test_matrix_predicates():
    inside = relate_point_polygon(2, 2, SQUARE)
    boundary = relate_point_polygon(0, 2, SQUARE)
    outside = relate_point_polygon(9, 9, SQUARE)
    # polygon-contains-point uses the transposed view: point within polygon
    assert is_within(inside)
    assert not is_within(boundary)
    assert is_intersects(inside) and is_intersects(boundary)
    assert not is_intersects(outside)
    # point "covers"/"contains" of itself
    eq = relate_point_point(1, 1, 1, 1)
    ne = relate_point_point(1, 1, 2, 2)
    assert is_contains(eq) and is_covers(eq)
    assert not is_contains(ne) and not is_intersects(ne)


def test_point_linestring():
    line = np.asarray([(0, 0), (10, 0)], dtype=np.float64)
    assert relate_point_linestring(5, 0, line) == "0FFFFF102"
    assert relate_point_linestring(0, 0, line) == "F0FFFF102"
    assert relate_point_linestring(5, 3, line) == "FF0FFF102"
    ring = np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=np.float64)
    assert relate_point_linestring(2, 0, ring) == "0FFFFF1F2"


def test_de9im_pattern_language():
    assert de9im_matches("0FFFFF212", "T*F**F***")
    assert not de9im_matches("F0FFFF212", "T*F**F***")
    assert de9im_matches("012TF12F0", "*********")


def test_linestrings_intersect_cases():
    # intersects/mod.rs test shapes: crossing, parallel, touching
    cross_a = np.asarray([(0, 0), (10, 10)], dtype=np.float64)
    cross_b = np.asarray([(0, 10), (10, 0)], dtype=np.float64)
    assert linestrings_intersect(cross_a, cross_b)
    parallel = np.asarray([(0, 1), (10, 11)], dtype=np.float64)
    assert not linestrings_intersect(cross_a, parallel)
    touch = np.asarray([(10, 10), (20, 0)], dtype=np.float64)
    assert linestrings_intersect(cross_a, touch)
    short = np.asarray([(5.0, 5.0)], dtype=np.float64)
    assert not linestrings_intersect(cross_a, short)


def test_linestring_polygon_intersects():
    crossing = np.asarray([(-2, 2), (6, 2)], dtype=np.float64)
    inside = np.asarray([(1, 0.5), (2, 0.5)], dtype=np.float64)
    outside = np.asarray([(9, 9), (12, 12)], dtype=np.float64)
    in_hole = np.asarray([(1.5, 1.5), (2.5, 2.5)], dtype=np.float64)
    assert linestring_intersects_polygon(crossing, SQUARE)
    assert linestring_intersects_polygon(inside, SQUARE)
    assert not linestring_intersects_polygon(outside, SQUARE)
    assert not linestring_intersects_polygon(in_hole, SQUARE, [HOLE])
    # crossing the hole entirely (enters ring material on both sides)
    through = np.asarray([(0.5, 2), (3.5, 2)], dtype=np.float64)
    assert linestring_intersects_polygon(through, SQUARE, [HOLE])


def test_polygons_intersect():
    other = SQUARE + np.array([3.0, 3.0])
    disjoint = SQUARE + np.array([10.0, 10.0])
    touching = SQUARE + np.array([4.0, 0.0])
    contained = np.asarray([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)], dtype=np.float64)
    assert polygons_intersect(SQUARE, [], other, [])
    assert not polygons_intersect(SQUARE, [], disjoint, [])
    assert polygons_intersect(SQUARE, [], touching, [])
    assert polygons_intersect(SQUARE, [], contained, [])
    assert polygons_intersect(contained, [], SQUARE, [])
    # island-in-hole: disjoint interiors
    island = np.asarray(
        [(1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5), (1.5, 1.5)], dtype=np.float64
    )
    assert not polygons_intersect(SQUARE, [HOLE], island, [])


# --- full DE-9IM (kernels/relate2.py) ---------------------------------------


def _poly(x0, y0, x1, y1):
    import numpy as np

    return ("Polygon", [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)])


def _line(*pts):
    import numpy as np

    return ("LineString", np.array(pts, float))


def test_relate_matrix_canonical_aa():
    from geo_spark.kernels.relate2 import relate_matrix

    assert relate_matrix(_poly(0, 0, 1, 1), _poly(5, 5, 6, 6)) == "FF2FF1212"
    assert relate_matrix(_poly(0, 0, 1, 1), _poly(1, 0, 2, 1)) == "FF2F11212"
    assert relate_matrix(_poly(0, 0, 2, 2), _poly(1, 1, 3, 3)) == "212101212"
    assert relate_matrix(_poly(0, 0, 1, 1), _poly(0, 0, 1, 1)) == "2FFF1FFF2"
    assert relate_matrix(_poly(0, 0, 4, 4), _poly(1, 1, 2, 2)) == "212FF1FF2"
    # corner touch
    assert relate_matrix(_poly(0, 0, 1, 1), _poly(1, 1, 2, 2)) == "FF2F01212"


def test_relate_matrix_canonical_ll():
    from geo_spark.kernels.relate2 import relate_matrix

    assert relate_matrix(_line((0, 0), (2, 2)), _line((0, 2), (2, 0))) == "0F1FF0102"
    assert relate_matrix(_line((0, 0), (3, 0)), _line((1, 0), (5, 0))) == "1010F0102"
    assert relate_matrix(_line((0, 0), (1, 1)), _line((1, 1), (2, 0))) == "FF1F00102"
    assert relate_matrix(_line((0, 0), (1, 1)), _line((0, 0), (1, 1))) == "1FFF0FFF2"
    # closed ring has no boundary
    ring = _line((0, 0), (1, 0), (1, 1), (0, 1), (0, 0))
    assert relate_matrix(ring, _line((5, 5), (6, 6)))[3] == "F"


def test_relate_matrix_canonical_la():
    from geo_spark.kernels.relate2 import relate_matrix

    assert relate_matrix(_line((-1, 0.5), (3, 0.5)), _poly(0, 0, 2, 1)) == "101FF0212"
    assert relate_matrix(_line((0.2, 0.5), (0.8, 0.5)), _poly(0, 0, 1, 1)) == "1FF0FF212"
    assert relate_matrix(_line((0, 0), (1, 0)), _poly(0, 0, 1, 1)) == "F1FF0F212"
    # transpose consistency
    m_ab = relate_matrix(_poly(0, 0, 2, 1), _line((-1, 0.5), (3, 0.5)))
    assert m_ab == "".join("101FF0212"[3 * j + i] for i in range(3) for j in range(3))


def test_relate_matrix_multipolygon_touch_point():
    # JTS semantics: a point where two members of a multipolygon touch is
    # Boundary for relate (not mod-2 Interior) — TestRelatePA 'mod-2 I' case
    import numpy as np

    from geo_spark.kernels.relate2 import relate_matrix

    mp = (
        "MultiPolygon",
        [
            [np.array([(0, 40), (0, 0), (40, 0), (40, 40), (0, 40)], float)],
            [np.array([(40, 80), (40, 40), (80, 40), (80, 80), (40, 80)], float)],
        ],
    )
    assert relate_matrix(("Point", np.array([40.0, 40.0])), mp) == "F0FFFF212"


def test_relate_predicates_from_matrix():
    from geo_spark.kernels.relate import is_contains, is_intersects, is_touches
    from geo_spark.kernels.relate2 import relate_matrix

    assert is_touches(relate_matrix(_poly(0, 0, 1, 1), _poly(1, 0, 2, 1)))
    assert not is_touches(relate_matrix(_poly(0, 0, 2, 2), _poly(1, 1, 3, 3)))
    assert is_contains(relate_matrix(_poly(0, 0, 4, 4), _poly(1, 1, 2, 2)))
    assert is_intersects(relate_matrix(_line((0, 0), (2, 2)), _line((0, 2), (2, 0))))
