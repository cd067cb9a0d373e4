"""Distance / bearing / destination kernels, vectorized over numpy arrays.

Parity targets (reference behavior, not code):

- Haversine on the GRS80 mean-radius sphere R1 = 6_371_008.8 m with the
  ``min(a, 1)`` clamp before ``asin``
  (``geo/src/algorithm/line_measures/metric_spaces/haversine.rs:126-128,266-277``);
- Vincenty inverse on WGS-84 (a=6_378_137, b=6_356_752.314245), 1e-12
  convergence, 100-iteration cap, NaN for antipodal non-convergence
  (``geo/src/algorithm/vincenty_distance.rs:50-160``; constants
  ``geo/src/lib.rs:336-343``);
- Rhumb line (loxodrome) distance/bearing on the same R1 sphere
  (``geo/src/algorithm/rhumb/mod.rs:32-92``);
- planar Euclidean point/segment distances
  (``line_measures/metric_spaces/euclidean/distance.rs`` semantics).

Golden values used in tests: NYC→London haversine 5_570_230 m (rounded),
Sofia→Plovdiv 132433.09929460194 m, vincenty 5_585_234 m, rhumb 5_794_129 m.
"""

from __future__ import annotations

import numpy as np

MEAN_EARTH_RADIUS = 6_371_008.8  # GRS80 R1 (Moritz 2000), as in the reference
EQUATORIAL_EARTH_RADIUS = 6_378_137.0
POLAR_EARTH_RADIUS = 6_356_752.314_245
EARTH_FLATTENING = (EQUATORIAL_EARTH_RADIUS - POLAR_EARTH_RADIUS) / EQUATORIAL_EARTH_RADIUS


def _as_f64(*vals):
    return [np.asarray(v, dtype=np.float64) for v in vals]


def haversine_distance(lon1, lat1, lon2, lat2, radius: float = MEAN_EARTH_RADIUS):
    """Great-circle distance in meters (haversine formula, clamped)."""
    lon1, lat1, lon2, lat2 = _as_f64(lon1, lat1, lon2, lat2)
    theta1 = np.radians(lat1)
    theta2 = np.radians(lat2)
    delta_theta = np.radians(lat2 - lat1)
    delta_lambda = np.radians(lon2 - lon1)
    a = np.sin(delta_theta / 2.0) ** 2 + np.cos(theta1) * np.cos(theta2) * np.sin(
        delta_lambda / 2.0
    ) ** 2
    a = np.minimum(a, 1.0)
    return radius * (2.0 * np.arcsin(np.sqrt(a)))


def haversine_bearing(lon1, lat1, lon2, lat2):
    """Initial great-circle bearing in degrees, normalized to [0, 360)."""
    lon1, lat1, lon2, lat2 = _as_f64(lon1, lat1, lon2, lat2)
    lng_a, lat_a = np.radians(lon1), np.radians(lat1)
    lng_b, lat_b = np.radians(lon2), np.radians(lat2)
    delta_lng = lng_b - lng_a
    s = np.cos(lat_b) * np.sin(delta_lng)
    c = np.cos(lat_a) * np.sin(lat_b) - np.sin(lat_a) * np.cos(lat_b) * np.cos(delta_lng)
    degrees = np.degrees(np.arctan2(s, c))
    return (degrees + 360.0) % 360.0


def haversine_destination(lon, lat, bearing_deg, meters, radius: float = MEAN_EARTH_RADIUS):
    """Point reached travelling ``meters`` along a great circle. Returns (lon, lat)."""
    lon, lat, bearing_deg, meters = _as_f64(lon, lat, bearing_deg, meters)
    center_lng = np.radians(lon)
    center_lat = np.radians(lat)
    bearing_rad = np.radians(bearing_deg)
    rad = meters / radius
    dlat = np.arcsin(
        np.sin(center_lat) * np.cos(rad)
        + np.cos(center_lat) * np.sin(rad) * np.cos(bearing_rad)
    )
    dlng = (
        np.arctan2(
            np.sin(bearing_rad) * np.sin(rad) * np.cos(center_lat),
            np.cos(rad) - np.sin(center_lat) * np.sin(dlat),
        )
        + center_lng
    )
    out_lon = normalize_longitude(np.degrees(dlng))
    return out_lon, np.degrees(dlat)


def normalize_longitude(deg):
    """Wrap longitude into [-180, 180] (same formula as the reference utils)."""
    deg = np.asarray(deg, dtype=np.float64)
    return ((deg + 540.0) % 360.0) - 180.0


def _rhumb_parts(lon1, lat1, lon2, lat2):
    phi1 = np.radians(lat1)
    phi2 = np.radians(lat2)
    delta_lambda = np.radians(lon2 - lon1)
    delta_lambda = np.where(delta_lambda > np.pi, delta_lambda - 2 * np.pi, delta_lambda)
    delta_lambda = np.where(delta_lambda < -np.pi, delta_lambda + 2 * np.pi, delta_lambda)
    delta_psi = np.log(
        np.tan(phi2 / 2.0 + np.pi / 4.0) / np.tan(phi1 / 2.0 + np.pi / 4.0)
    )
    delta_phi = phi2 - phi1
    return phi1, delta_lambda, delta_phi, delta_psi


def rhumb_distance(lon1, lat1, lon2, lat2, radius: float = MEAN_EARTH_RADIUS):
    """Loxodrome distance in meters (Movable-Type/Turf formulation)."""
    lon1, lat1, lon2, lat2 = _as_f64(lon1, lat1, lon2, lat2)
    phi1, delta_lambda, delta_phi, delta_psi = _rhumb_parts(lon1, lat1, lon2, lat2)
    q = np.where(np.abs(delta_psi) > 10.0e-12, delta_phi / np.where(delta_psi == 0, 1, delta_psi), np.cos(phi1))
    delta = np.sqrt(delta_phi * delta_phi + q * q * delta_lambda * delta_lambda)
    return delta * radius


def rhumb_bearing(lon1, lat1, lon2, lat2):
    """Constant loxodrome bearing in degrees [0, 360)."""
    lon1, lat1, lon2, lat2 = _as_f64(lon1, lat1, lon2, lat2)
    _, delta_lambda, _, delta_psi = _rhumb_parts(lon1, lat1, lon2, lat2)
    theta = np.degrees(np.arctan2(delta_lambda, delta_psi))
    return (theta + 360.0) % 360.0


def vincenty_distance(lon1, lat1, lon2, lat2, tol: float = 1e-12, max_iter: int = 100):
    """Vincenty inverse geodesic distance on WGS-84, in meters.

    Vectorized fixed-point iteration: the whole batch iterates together with
    a convergence mask. Coincident points → 0. Antipodal/non-converged → NaN
    (the reference returns ``Err(FailedToConvergeError)``).
    """
    lon1, lat1, lon2, lat2 = np.broadcast_arrays(*_as_f64(lon1, lat1, lon2, lat2))
    shape = lon1.shape
    lon1, lat1, lon2, lat2 = (v.ravel() for v in (lon1, lat1, lon2, lat2))
    a, b, f = EQUATORIAL_EARTH_RADIUS, POLAR_EARTH_RADIUS, EARTH_FLATTENING

    L = np.radians(lon2 - lon1)
    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    active = np.ones(lam.shape, dtype=bool)
    sinSigma = np.zeros_like(lam)
    cosSigma = np.zeros_like(lam)
    sigma = np.zeros_like(lam)
    cosSqAlpha = np.zeros_like(lam)
    cos2SigmaM = np.zeros_like(lam)
    failed = np.zeros(lam.shape, dtype=bool)
    coincident = np.zeros(lam.shape, dtype=bool)

    for _ in range(max_iter):
        if not active.any():
            break
        sinLambda = np.sin(lam[active])
        cosLambda = np.cos(lam[active])
        cu1, su1 = cosU1[active], sinU1[active]
        cu2, su2 = cosU2[active], sinU2[active]
        t1 = cu2 * sinLambda
        t2 = cu1 * su2 - su1 * cu2 * cosLambda
        ss = np.sqrt(t1 * t1 + t2 * t2)

        zero = ss == 0.0
        if zero.any():
            idx = np.flatnonzero(active)[zero]
            same = (lon1[idx] == lon2[idx]) & (lat1[idx] == lat2[idx])
            coincident[idx[same]] = True
            failed[idx[~same]] = True

        cs = su1 * su2 + cu1 * cu2 * cosLambda
        with np.errstate(invalid="ignore", divide="ignore"):
            sig = np.arctan2(ss, cs)
            sinAlpha = np.where(ss == 0, 0.0, cu1 * cu2 * sinLambda / np.where(ss == 0, 1, ss))
            csa = 1.0 - sinAlpha * sinAlpha
            c2sm = np.where(csa == 0.0, 0.0, cs - 2.0 * su1 * su2 / np.where(csa == 0, 1, csa))
            C = f / 16.0 * csa * (4.0 + f * (4.0 - 3.0 * csa))
            new_lam = L[active] + (1.0 - C) * f * sinAlpha * (
                sig + C * ss * (c2sm + C * cs * (-1.0 + 2.0 * c2sm * c2sm))
            )

        sinSigma[active] = ss
        cosSigma[active] = cs
        sigma[active] = sig
        cosSqAlpha[active] = csa
        cos2SigmaM[active] = c2sm
        converged = np.abs(new_lam - lam[active]) <= tol
        lam[active] = new_lam
        idx_active = np.flatnonzero(active)
        done = converged | zero
        active[idx_active[done]] = False
    else:
        failed |= active  # hit the iteration cap without converging

    uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    A = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    B = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    deltaSigma = (
        B
        * sinSigma
        * (
            cos2SigmaM
            + B
            / 4.0
            * (
                cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)
                - B
                / 6.0
                * cos2SigmaM
                * (-3.0 + 4.0 * sinSigma * sinSigma)
                * (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)
            )
        )
    )
    s = b * A * (sigma - deltaSigma)
    s = np.where(coincident, 0.0, s)
    s = np.where(failed & ~coincident, np.nan, s)
    return s.reshape(shape)


def euclidean_distance(ax, ay, bx, by):
    """Planar point-to-point distance."""
    ax, ay, bx, by = _as_f64(ax, ay, bx, by)
    dx = ax - bx
    dy = ay - by
    return np.sqrt(dx * dx + dy * dy)


def point_segment_distance(px, py, ax, ay, bx, by):
    """Planar distance from point p to segment (a, b), vectorized."""
    px, py, ax, ay, bx, by = _as_f64(px, py, ax, ay, bx, by)
    dx = bx - ax
    dy = by - ay
    seg_len2 = dx * dx + dy * dy
    t = np.where(seg_len2 == 0, 0.0, ((px - ax) * dx + (py - ay) * dy) / np.where(seg_len2 == 0, 1, seg_len2))
    t = np.clip(t, 0.0, 1.0)
    qx = ax + t * dx
    qy = ay + t * dy
    return euclidean_distance(px, py, qx, qy)


def cross_track_distance(pl_lon, pl_lat, a_lon, a_lat, b_lon, b_lat, radius: float = MEAN_EARTH_RADIUS):
    """Distance from a point to the great-circle path through (a, b), meters.

    Spherical cross-track formula (``cross_track_distance.rs:7`` semantics):
    d_xt = asin(sin(d13/R) * sin(theta13 - theta12)) * R.
    """
    d13 = haversine_distance(a_lon, a_lat, pl_lon, pl_lat, radius) / radius
    theta13 = np.radians(haversine_bearing(a_lon, a_lat, pl_lon, pl_lat))
    theta12 = np.radians(haversine_bearing(a_lon, a_lat, b_lon, b_lat))
    return np.abs(np.arcsin(np.sin(d13) * np.sin(theta13 - theta12))) * radius


# --- spherical (great-circle) closest point ---------------------------------


def _unit_vec(lon_deg: float, lat_deg: float) -> np.ndarray:
    lam, phi = np.radians(lon_deg), np.radians(lat_deg)
    return np.array(
        [np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)]
    )


def _vec_lonlat(v: np.ndarray) -> tuple[float, float]:
    return float(np.degrees(np.arctan2(v[1], v[0]))), float(
        np.degrees(np.arctan2(v[2], np.hypot(v[0], v[1])))
    )


def haversine_closest_point_segment(plon, plat, alon, alat, blon, blat):
    """Closest point (lon, lat) on the great-circle segment A→B to P.

    Parity: ``HaversineClosestPoint`` (``haversine_closest_point.rs:37-``) —
    true spherical geometry via 3-D unit vectors (project P onto the great
    circle through A,B; clamp to the arc), replacing the planar projection
    that drifts on long segments at high latitude.
    """
    A = _unit_vec(alon, alat)
    B = _unit_vec(blon, blat)
    P = _unit_vec(plon, plat)
    n = np.cross(A, B)
    nn = np.linalg.norm(n)
    if nn < 1e-15:  # degenerate segment (A == B or antipodal)
        return (alon, alat)
    n /= nn
    Pp = P - np.dot(P, n) * n
    norm = np.linalg.norm(Pp)
    if norm < 1e-15:  # P at the circle's pole: every circle point equidistant
        return (alon, alat)
    Pp /= norm
    # on-arc test: the projection is between A and B iff both partial arcs
    # are no longer than the full arc
    ang_ab = np.arctan2(nn, np.dot(A, B))
    ang_ap = np.arctan2(np.linalg.norm(np.cross(A, Pp)), np.dot(A, Pp))
    ang_pb = np.arctan2(np.linalg.norm(np.cross(Pp, B)), np.dot(Pp, B))
    if ang_ap <= ang_ab and ang_pb <= ang_ab:
        return _vec_lonlat(Pp)
    da = haversine_distance(plon, plat, alon, alat)
    db = haversine_distance(plon, plat, blon, blat)
    return (alon, alat) if da <= db else (blon, blat)


def haversine_closest_point_linestring(plon, plat, coords) -> tuple[float, float]:
    """Closest point on a linestring under great-circle distance."""
    coords = np.asarray(coords, dtype=np.float64)
    best = None
    best_d = np.inf
    for k in range(len(coords) - 1):
        c = haversine_closest_point_segment(
            plon, plat, coords[k, 0], coords[k, 1], coords[k + 1, 0], coords[k + 1, 1]
        )
        d = haversine_distance(plon, plat, c[0], c[1])
        if d < best_d:
            best, best_d = c, d
    return best if best is not None else (float(coords[0, 0]), float(coords[0, 1]))
