"""Concave hulls, Delaunay, Voronoi — property-based correctness."""

import numpy as np
import pytest

from geo_spark.kernels.area import polygon_unsigned_area, ring_signed_area
from geo_spark.kernels.hull import quick_hull
from geo_spark.kernels.hull2 import concave_hull, k_nearest_concave_hull
from geo_spark.kernels.predicates import ring_position
from geo_spark.kernels.triangulate import circumcenter, delaunay, incircle, voronoi_cells


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(11)
    return rng.uniform(0, 100, (60, 2))


def _covers_all(ring, pts):
    pos = ring_position(pts[:, 0], pts[:, 1], ring)
    return (pos >= 0).all()


def test_concave_hull_covers_and_shrinks(cloud):
    convex = quick_hull(cloud)
    hull = concave_hull(cloud, concavity=2.0)
    assert _covers_all(hull, cloud)
    assert abs(ring_signed_area(hull)) <= abs(ring_signed_area(convex)) + 1e-9
    # high concavity → effectively convex
    near_convex = concave_hull(cloud, concavity=1e9)
    assert abs(ring_signed_area(near_convex)) == pytest.approx(
        abs(ring_signed_area(convex)), rel=1e-9
    )


def test_concave_hull_l_distribution():
    # points sampled along an L — concave hull should carve the notch
    rng = np.random.RandomState(4)
    arm1 = np.column_stack([rng.uniform(0, 10, 150), rng.uniform(0, 2, 150)])
    arm2 = np.column_stack([rng.uniform(0, 2, 150), rng.uniform(0, 10, 150)])
    pts = np.vstack([arm1, arm2])
    hull = concave_hull(pts, concavity=1.5)
    convex_area = abs(ring_signed_area(quick_hull(pts)))
    concave_area = abs(ring_signed_area(hull))
    assert _covers_all(hull, pts)
    assert concave_area < 0.75 * convex_area  # the notch was carved


def test_knn_concave_hull(cloud):
    hull = k_nearest_concave_hull(cloud, k=5)
    assert (hull[0] == hull[-1]).all()
    assert _covers_all(hull, cloud)


def test_delaunay_empty_circumcircle(cloud):
    pts = cloud[:25]
    tris = delaunay(pts)
    assert len(tris) >= 1
    # every triangle CCW and empty-circumcircle
    for (a, b, c) in tris:
        pa, pb, pc = pts[a], pts[b], pts[c]
        for d in range(len(pts)):
            if d in (a, b, c):
                continue
            assert incircle(
                pa[0], pa[1], pb[0], pb[1], pc[0], pc[1], pts[d, 0], pts[d, 1]
            ) <= 0
    # triangulation area == convex hull area
    hull_area = abs(ring_signed_area(quick_hull(pts)))
    tri_area = sum(
        abs(
            (pts[b][0] - pts[a][0]) * (pts[c][1] - pts[a][1])
            - (pts[b][1] - pts[a][1]) * (pts[c][0] - pts[a][0])
        )
        / 2.0
        for a, b, c in tris
    )
    assert tri_area == pytest.approx(hull_area, rel=1e-9)


def test_delaunay_grid_degenerate():
    # cocircular grid points — must still produce a valid triangulation
    xs, ys = np.meshgrid(np.arange(4.0), np.arange(4.0))
    pts = np.column_stack([xs.ravel(), ys.ravel()])
    tris = delaunay(pts)
    tri_area = sum(
        abs(
            (pts[b][0] - pts[a][0]) * (pts[c][1] - pts[a][1])
            - (pts[b][1] - pts[a][1]) * (pts[c][0] - pts[a][0])
        )
        / 2.0
        for a, b, c in tris
    )
    assert tri_area == pytest.approx(9.0, rel=1e-9)  # 3x3 square


def test_voronoi_cells_contain_sites(cloud):
    pts = cloud[:20]
    cells = voronoi_cells(pts)
    assert len(cells) == 20
    total = 0.0
    for i, cell in enumerate(cells):
        assert len(cell) >= 4
        assert ring_position([pts[i, 0]], [pts[i, 1]], cell)[0] >= 0
        total += abs(ring_signed_area(cell))
    # cells tile the clip rect exactly
    xmin, ymin = pts.min(axis=0)
    xmax, ymax = pts.max(axis=0)
    mx, my = (xmax - xmin) * 0.1, (ymax - ymin) * 0.1
    rect_area = (xmax - xmin + 2 * mx) * (ymax - ymin + 2 * my)
    assert total == pytest.approx(rect_area, rel=1e-9)


def test_circumcenter():
    c = circumcenter((0, 0), (2, 0), (0, 2))
    assert c == (1.0, 1.0)
    assert circumcenter((0, 0), (1, 1), (2, 2)) is None  # collinear


def test_spade_triangulation_reference_doctests():
    # triangulate_spade.rs doctest goldens: u-shape → 8 / 8 / 6 triangles
    import numpy as np
    from geo_spark.kernels.triangulate import spade_triangulation

    u = np.array(
        [(0, 0), (1, 0), (1, 1), (2, 1), (2, 0), (3, 0), (3, 3), (0, 3), (0, 0)],
        dtype=float,
    )
    for mode, n_exp, area_exp in [
        ("unconstrained", 8, 9.0), ("outer", 8, 9.0), ("constrained", 6, 8.0)
    ]:
        pts, tris = spade_triangulation([u], mode)
        assert len(tris) == n_exp, mode
        tot = 0.0
        for a, b, c in tris:
            pa, pb, pc = pts[a], pts[b], pts[c]
            tot += abs((pb[0]-pa[0])*(pc[1]-pa[1])-(pb[1]-pa[1])*(pc[0]-pa[0]))/2
        assert abs(tot - area_exp) < 1e-12, mode


def test_spade_constrained_with_hole():
    import numpy as np
    from geo_spark.kernels.triangulate import spade_triangulation

    ext = np.array([(0, 0), (6, 0), (6, 6), (0, 6), (0, 0)], dtype=float)
    hole = np.array([(2, 2), (2, 4), (4, 4), (4, 2), (2, 2)], dtype=float)
    pts, tris = spade_triangulation([ext, hole], "constrained")
    tot = 0.0
    for a, b, c in tris:
        pa, pb, pc = pts[a], pts[b], pts[c]
        tot += abs((pb[0]-pa[0])*(pc[1]-pa[1])-(pb[1]-pa[1])*(pc[0]-pa[0]))/2
    assert abs(tot - 32.0) < 1e-12  # 36 - 4
    # Euler: v + 2h - 2 triangles for a polygon with h holes, no Steiner pts
    assert len(tris) == 8 + 2 * 1 - 2
    # every constraint edge present
    edges = set()
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges.add((min(e), max(e)))
    def idx_of(p):
        return [i for i, q in enumerate(pts) if (q == p).all()][0]
    for ring in (ext, hole):
        for k in range(len(ring) - 1):
            i, j = idx_of(ring[k]), idx_of(ring[k + 1])
            assert (min(i, j), max(i, j)) in edges


def test_delaunay_covers_hull_with_near_edge_points():
    # Regression (round 5): a point at distance ~1e-4..1e-13 from a hull
    # edge has a circumcircle large enough to reach a too-close super
    # triangle; the old 64x-span frame triangulated the hull edge THROUGH
    # the super vertices and dropping them left a concave pocket (observed
    # 3e-4 lost area on a 9-point set). The frame is now 1e12x span.
    import numpy as np
    from geo_spark.kernels.hull import quick_hull
    from geo_spark.kernels.triangulate import delaunay

    def tri_area_sum(pts, tris):
        s = 0.0
        for (a, b, c) in tris:
            pa, pb, pc = pts[a], pts[b], pts[c]
            s += abs((pb[0]-pa[0])*(pc[1]-pa[1])-(pb[1]-pa[1])*(pc[0]-pa[0]))/2
        return s

    def hull_area(pts):
        h = np.asarray(quick_hull(pts))
        x, y = h[:, 0], h[:, 1]
        return abs(np.sum(x*np.roll(y, -1)-np.roll(x, -1)*y))/2

    rng = np.random.default_rng(7)
    for trial in range(300):
        n = int(rng.integers(4, 40))  # covers scalar (<=32) and vector paths
        pts = rng.random((n, 2))
        pts[0] = (0.0, 0.0)
        pts[1] = (1.0, 0.0)
        pts[2] = (rng.random(), rng.random() * 10.0 ** -rng.integers(3, 14))
        da = tri_area_sum(pts, delaunay(pts))
        ha = hull_area(pts)
        assert abs(da - ha) < 1e-9 * max(ha, 1e-9), (trial, ha - da)


def test_constrained_delaunay_honors_every_edge_near_degenerate():
    # Regression (round-5 ADVICE): constrained_delaunay silently dropped a
    # constraint edge when the base triangulation under-covered a sliver;
    # it now both recovers (bigger frame) and verifies every constraint.
    import numpy as np
    from geo_spark.kernels.triangulate import spade_triangulation

    def poly_area(ring):
        x, y = ring[:-1, 0], ring[:-1, 1]
        return abs(np.sum(x*np.roll(y, -1)-np.roll(x, -1)*y))/2

    rng = np.random.default_rng(0)
    tested = 0
    for trial in range(400):
        n = int(rng.integers(4, 12))
        pts = rng.random((n, 2))
        if trial % 2:
            pts[:, 1] *= 10.0 ** -rng.integers(2, 13)
            pts[int(rng.integers(0, n)), 1] = rng.random() * 0.5 + 0.1
        c = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1]-c[1], pts[:, 0]-c[0])
        pts = pts[np.argsort(ang)]
        ring = np.vstack([pts, pts[:1]])
        true_a = poly_area(ring)
        if true_a < 1e-12:
            continue
        tested += 1
        ppts, tris = spade_triangulation([ring], mode="constrained")
        got = 0.0
        for (a, b, c3) in tris:
            pa, pb, pc = ppts[a], ppts[b], ppts[c3]
            got += abs((pb[0]-pa[0])*(pc[1]-pa[1])-(pb[1]-pa[1])*(pc[0]-pa[0]))/2
        assert abs(got - true_a) < 1e-9 * max(true_a, 1e-9), (trial, true_a, got)
    assert tested > 300
