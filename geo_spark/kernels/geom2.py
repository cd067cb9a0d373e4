"""Second geometry kernel batch: triangulation, interior point, validation,
spherical area, dimension classifier, remaining measures.

Parity targets:

- ``TriangulateEarcut`` (``triangulate_earcut.rs:7``, ext earcut crate):
  ear-clipping triangulation of a simple polygon; invariant checked is the
  exact one the algorithm guarantees — n-2 triangles whose areas sum to the
  ring area;
- ``InteriorPoint`` (``interior_point.rs:56``): representative point
  guaranteed inside — widest-scanline-midpoint construction;
- ``Validation`` (``validation/mod.rs:62-101`` + per-type files): ring
  closure/min-points, finite coords, self-intersection, holes inside shell,
  hole nesting;
- ``ChamberlainDuquetteArea`` (``chamberlain_duquette_area.rs:29-108``):
  spherical excess approximation on the WGS84 equatorial sphere, exterior
  minus holes, sign follows winding; golden: O2 London = 78,478 m²;
- ``HasDimensions`` (``dimensions.rs:39``): 0/1/2-dimensional + empty;
- ``VincentyLength`` (``vincenty_length.rs:9``): per-segment vincenty sum;
- rhumb destination / haversine intermediate (``rhumb/mod.rs:135``,
  ``haversine.rs`` InterpolatePoint).
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernels.measures import (
    EQUATORIAL_EARTH_RADIUS,
    MEAN_EARTH_RADIUS,
    haversine_distance,
    normalize_longitude,
    vincenty_distance,
)
from geo_spark.kernels.predicates import orient2d, ring_position, segments_intersect


# --- ear-clipping triangulation ------------------------------------------------

def triangulate_earcut(ring: np.ndarray) -> list[tuple[int, int, int]]:
    """Triangle vertex-index triples for a simple (no holes) closed ring.

    Classic ear clipping with robust orientation tests; indices refer to the
    open ring (closing duplicate dropped). CCW input assumed; CW input is
    reversed first.
    """
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    n = len(ring)
    if n < 3:
        return []
    from geo_spark.kernels.area import twice_signed_ring_area

    closed = np.vstack([ring, ring[:1]])
    reversed_input = twice_signed_ring_area(closed) < 0
    idx = list(range(n))
    if reversed_input:
        idx = idx[::-1]

    def is_ear(i_prev, i_cur, i_next) -> bool:
        a, b, c = ring[i_prev], ring[i_cur], ring[i_next]
        if int(orient2d(a[0], a[1], b[0], b[1], c[0], c[1])) <= 0:
            return False  # reflex or degenerate
        # no other active vertex strictly inside the candidate ear
        for j in idx:
            if j in (i_prev, i_cur, i_next):
                continue
            p = ring[j]
            s1 = int(orient2d(a[0], a[1], b[0], b[1], p[0], p[1]))
            s2 = int(orient2d(b[0], b[1], c[0], c[1], p[0], p[1]))
            s3 = int(orient2d(c[0], c[1], a[0], a[1], p[0], p[1]))
            if s1 >= 0 and s2 >= 0 and s3 >= 0:
                return False
        return True

    tris: list[tuple[int, int, int]] = []
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        m = len(idx)
        clipped = False
        for k in range(m):
            i_prev, i_cur, i_next = idx[k - 1], idx[k], idx[(k + 1) % m]
            if is_ear(i_prev, i_cur, i_next):
                tris.append((i_prev, i_cur, i_next))
                idx.pop(k)
                clipped = True
                break
        if not clipped:
            break  # degenerate input; return what we have
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return tris


# --- interior point --------------------------------------------------------------

def interior_point(exterior: np.ndarray, interiors=()) -> tuple[float, float] | None:
    """A point guaranteed strictly inside the polygon (widest scanline midpoint)."""
    from geo_spark.kernels.area import polygon_centroid
    from geo_spark.kernels.predicates import polygon_position

    ext = np.asarray(exterior, dtype=np.float64)
    if len(ext) < 4:
        return None
    c = polygon_centroid(ext, interiors)
    if c is not None and polygon_position([c[0]], [c[1]], ext, interiors)[0] == 1:
        return c
    # scan at the centroid's y, nudged off any vertex y
    ys = ext[:, 1]
    y = c[1] if c is not None else float(ys.mean())
    if np.any(ys == y):
        lo = ys[ys < y]
        hi = ys[ys > y]
        if len(lo) and len(hi):
            y = (lo.max() + hi.min()) / 2.0
        else:
            y = float(np.nextafter(y, ys.mean() + 1.0))
    xs = []
    rings = [ext] + [np.asarray(h, dtype=np.float64) for h in interiors]
    for ring in rings:
        sx, sy = ring[:-1, 0], ring[:-1, 1]
        ex, ey = ring[1:, 0], ring[1:, 1]
        crosses = ((sy <= y) & (ey > y)) | ((ey <= y) & (sy > y))
        with np.errstate(invalid="ignore", divide="ignore"):
            t = (y - sy) / np.where(ey == sy, 1, ey - sy)
        xs.extend((sx + t * (ex - sx))[crosses].tolist())
    xs.sort()
    best = None
    best_w = -1.0
    for i in range(0, len(xs) - 1, 2):
        w = xs[i + 1] - xs[i]
        if w > best_w:
            best_w = w
            best = ((xs[i] + xs[i + 1]) / 2.0, y)
    return best


# --- validation --------------------------------------------------------------------

def validate_polygon(exterior: np.ndarray, interiors=()) -> list[str]:
    """List of validity problems (empty list == valid).

    Mirrors the reference's polygon checks (``validation/polygon.rs``):
    too-few-points, unclosed/non-finite rings, ring self-intersection,
    cross-ring intersection, hole outside shell, nested holes.
    """
    from geo_spark.kernels.simplify import remove_repeated_points

    problems: list[str] = []
    ext_arr = np.asarray(exterior, dtype=np.float64)
    if len(ext_arr) == 0 and all(len(np.asarray(h)) == 0 for h in interiors):
        return problems  # POLYGON EMPTY is valid
    # repeated consecutive points are tolerated (JTS isValid semantics);
    # validity is judged on the deduplicated rings
    rings = [remove_repeated_points(np.asarray(exterior, dtype=np.float64))] + [
        remove_repeated_points(np.asarray(h, dtype=np.float64)) for h in interiors
    ]
    for ri, ring in enumerate(rings):
        tag = "exterior" if ri == 0 else f"interior[{ri - 1}]"
        if len(ring) < 4:
            problems.append(f"{tag}: too few points")
            continue
        if not np.isfinite(ring).all():
            problems.append(f"{tag}: non-finite coordinate")
        if (ring[0] != ring[-1]).any():
            problems.append(f"{tag}: ring not closed")
        from geo_spark.kernels.area import ring_signed_area as _rsa

        if _rsa(ring) == 0.0:
            problems.append(f"{tag}: zero-area ring")
        if _ring_self_intersects(ring):
            problems.append(f"{tag}: self-intersection")
    if problems:
        return problems
    from geo_spark.kernels.area import ring_signed_area

    ext = rings[0]
    ext_area = abs(ring_signed_area(ext))
    for hi, hole in enumerate(rings[1:]):
        pos = ring_position(hole[:-1, 0], hole[:-1, 1], ext)
        if (pos == -1).any():
            problems.append(f"interior[{hi}]: outside the shell")
        elif not (pos == 1).any():
            # every hole vertex sits on the shell boundary: the hole interior
            # must still be inside the shell (rules out adjacent-outside and
            # hole-identical-to-shell shapes)
            if abs(ring_signed_area(hole)) >= ext_area:
                problems.append(f"interior[{hi}]: covers the shell")
            else:
                ip = interior_point(hole)
                if ip is None or ring_position([ip[0]], [ip[1]], ext)[0] != 1:
                    problems.append(f"interior[{hi}]: not inside the shell")
        for hj, other in enumerate(rings[1:]):
            if hj <= hi:
                continue
            pos2 = ring_position(other[:-1, 0], other[:-1, 1], hole)
            if (pos2 == 1).all():
                problems.append(f"interior[{hj}]: nested inside interior[{hi}]")
            elif (pos2 == 1).any():
                problems.append(
                    f"interior[{hj}]: overlaps interior[{hi}]"
                )
            else:
                # reverse direction: the earlier hole inside the later one
                # (vertex tests are one-sided — a shared vertex defeats the
                # forward check when the containment goes the other way)
                pos3 = ring_position(hole[:-1, 0], hole[:-1, 1], other)
                if (pos3 == 1).all():
                    problems.append(
                        f"interior[{hi}]: nested inside interior[{hj}]"
                    )
                elif (pos3 == 1).any():
                    problems.append(
                        f"interior[{hi}]: overlaps interior[{hj}]"
                    )
    if problems:
        return problems
    problems.extend(_ring_touch_problems(rings))
    return problems


def _ring_pair_events(ra: np.ndarray, rb: np.ndarray):
    """(touch point set, shares_segment, proper_cross) between two rings."""
    from geo_spark.kernels.lines import line_intersection

    pts: set = set()
    shares = False
    proper = False
    sa, ea = ra[:-1], ra[1:]
    sb, eb = rb[:-1], rb[1:]
    for i in range(len(sa)):
        for j in range(len(sb)):
            r = line_intersection(sa[i], ea[i], sb[j], eb[j])
            if r is None:
                continue
            if r[0] == "collinear":
                shares = True
            else:
                pts.add(r[1])
                if r[2]:
                    proper = True
    return pts, shares, proper


def _ring_touch_problems(rings) -> list[str]:
    """JTS interior-connectivity rules over the ring-touch multigraph.

    OGC/JTS validity (JTS IsValidOp, mirrored by the reference's validation
    module): rings may intersect only at a finite set of points (no shared
    segments, no proper crossings), and those touch points must not
    disconnect the interior. Disconnection ⟺ the multigraph whose nodes are
    rings and whose edges are the distinct touch points contains a cycle
    (two touches between the same pair of rings already form one): a hole
    touching the shell twice splits the polygon, a chain of holes touching
    in a loop encloses an island.
    """
    problems: list[str] = []
    tags = ["exterior"] + [f"interior[{i}]" for i in range(len(rings) - 1)]
    parent = list(range(len(rings)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            pts, shares, proper = _ring_pair_events(rings[i], rings[j])
            if shares:
                problems.append(f"{tags[j]}: shares a boundary segment with {tags[i]}")
                continue
            if proper:
                problems.append(f"{tags[j]}: crosses {tags[i]}")
                continue
            for _ in sorted(pts):
                ri, rj = find(i), find(j)
                if ri == rj:
                    problems.append(
                        f"{tags[j]}: touch with {tags[i]} disconnects the interior"
                    )
                    break
                parent[max(ri, rj)] = min(ri, rj)
    return problems


def validate_multipolygon(polys) -> list[str]:
    """Validity problems of a multipolygon: each component valid, and
    component interiors disjoint with boundaries meeting only at a finite
    point set (JTS multipolygon rules — adjacent/nested/duplicate shells are
    invalid). Empty components are ignored (they are valid)."""
    problems: list[str] = []
    live = []
    for idx, (ext, holes) in enumerate(polys):
        ext = np.asarray(ext, dtype=np.float64)
        if len(ext) == 0:
            continue
        live.append(idx)
        problems.extend(
            f"component[{idx}]: {p}" for p in validate_polygon(ext, holes)
        )
    if problems:
        return problems
    from geo_spark.kernels.relate2 import _relate_aa

    def as_pair(idx):
        ext, holes = polys[idx]
        return (
            np.asarray(ext, dtype=np.float64),
            [np.asarray(h, dtype=np.float64) for h in holes],
        )

    for a in range(len(live)):
        for b in range(a + 1, len(live)):
            i, j = live[a], live[b]
            m = _relate_aa([as_pair(i)], [as_pair(j)])
            if m[0] != "F":
                problems.append(f"component[{j}]: overlaps component[{i}]")
            elif m[4] == "1":
                problems.append(
                    f"component[{j}]: shares a boundary segment with component[{i}]"
                )
    return problems


def _ring_self_intersects(ring: np.ndarray) -> bool:
    """Any non-adjacent segment pair of the ring intersecting."""
    s = ring[:-1]
    e = ring[1:]
    m = len(s)
    for i in range(m):
        for j in range(i + 2, m):
            if i == 0 and j == m - 1:
                continue  # closing adjacency
            if segments_intersect(
                s[i, 0], s[i, 1], e[i, 0], e[i, 1], s[j, 0], s[j, 1], e[j, 0], e[j, 1]
            ):
                return True
    return False


# --- spherical area ------------------------------------------------------------------

def chamberlain_duquette_ring_area(ring: np.ndarray) -> float:
    """Signed spherical ring area in m² (Chamberlain-Duquette 2007)."""
    ring = np.asarray(ring, dtype=np.float64)
    n = len(ring)
    if n <= 2:
        return 0.0
    lo = np.arange(n)
    mid = np.where(lo == n - 1, 0, lo + 1)
    hi = np.where(lo >= n - 2, lo - (n - 2), lo + 2)
    p1x = np.radians(ring[lo, 0])
    p3x = np.radians(ring[hi, 0])
    p2y = np.radians(ring[mid, 1])
    total = float(np.sum((p3x - p1x) * np.sin(p2y)))
    return total * EQUATORIAL_EARTH_RADIUS * EQUATORIAL_EARTH_RADIUS / -2.0


def chamberlain_duquette_area(exterior: np.ndarray, interiors=()) -> float:
    """Signed polygon area: exterior ring minus holes (sign follows exterior)."""
    total = chamberlain_duquette_ring_area(np.asarray(exterior, dtype=np.float64))
    for hole in interiors:
        total -= chamberlain_duquette_ring_area(np.asarray(hole, dtype=np.float64))
    return total


# --- dimensions -----------------------------------------------------------------------

def dimensions(kind: str, coords) -> int:
    """OGC dimensionality: -1 empty, 0 points, 1 lines, 2 areas."""
    kind = kind.lower()
    n = 0 if coords is None else len(coords)
    if n == 0:
        return -1
    if kind in ("point", "multipoint"):
        return 0
    if kind in ("linestring", "multilinestring", "line"):
        arr = np.asarray(coords, dtype=np.float64)
        return 0 if len(np.unique(arr, axis=0)) < 2 else 1
    if kind in ("polygon", "multipolygon", "rect", "triangle"):
        return 2
    raise ValueError(f"unknown kind: {kind}")


# --- remaining measures -----------------------------------------------------------------

def vincenty_length(coords: np.ndarray) -> float:
    """Sum of per-segment vincenty distances (NaN if any segment fails)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return 0.0
    d = vincenty_distance(
        coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1]
    )
    return float(np.sum(d))


def haversine_length(coords: np.ndarray) -> float:
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return 0.0
    return float(
        np.sum(
            haversine_distance(coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1])
        )
    )


def rhumb_destination(lon, lat, bearing_deg, meters, radius: float = MEAN_EARTH_RADIUS):
    """Destination along a loxodrome (rhumb/mod.rs calculate_destination)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    delta = np.asarray(meters, dtype=np.float64) / radius
    theta = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    phi1 = np.radians(lat)
    lambda1 = np.radians(lon)
    dphi = delta * np.cos(theta)
    phi2 = phi1 + dphi
    dpsi = np.log(np.tan(phi2 / 2 + np.pi / 4) / np.tan(phi1 / 2 + np.pi / 4))
    with np.errstate(invalid="ignore", divide="ignore"):
        q = np.where(np.abs(dpsi) > 1e-11, dphi / dpsi, np.cos(phi1))
    dlambda = delta * np.sin(theta) / q
    lambda2 = lambda1 + dlambda
    # pole overshoot wraps per the movable-type formulation
    phi2 = np.where(np.abs(phi2) > np.pi / 2, np.where(phi2 > 0, np.pi - phi2, -np.pi - phi2), phi2)
    return normalize_longitude(np.degrees(lambda2)), np.degrees(phi2)


def haversine_intermediate(lon1, lat1, lon2, lat2, fraction: float):
    """Point at ``fraction`` along the great circle (slerp interpolation)."""
    lon1, lat1, lon2, lat2 = (
        np.asarray(v, dtype=np.float64) for v in (lon1, lat1, lon2, lat2)
    )
    f = float(fraction)
    l1, p1 = np.radians(lon1), np.radians(lat1)
    l2, p2 = np.radians(lon2), np.radians(lat2)
    d = haversine_distance(lon1, lat1, lon2, lat2, radius=1.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        a = np.where(d == 0, 1 - f, np.sin((1 - f) * d) / np.sin(d))
        b = np.where(d == 0, f, np.sin(f * d) / np.sin(d))
    x = a * np.cos(p1) * np.cos(l1) + b * np.cos(p2) * np.cos(l2)
    y = a * np.cos(p1) * np.sin(l1) + b * np.cos(p2) * np.sin(l2)
    z = a * np.sin(p1) + b * np.sin(p2)
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat
