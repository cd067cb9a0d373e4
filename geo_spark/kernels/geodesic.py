"""Geodesics on the ellipsoid — direct + inverse problems and polygon area.

Parity targets: the reference's ``Geodesic`` metric space
(``geo/src/algorithm/line_measures/metric_spaces/geodesic.rs`` — distance /
bearing / destination via Karney's algorithms) and ``GeodesicArea``
(``geo/src/algorithm/geodesic_area.rs``). The reference delegates to the
geographiclib crate; this is a from-scratch implementation of the same
mathematics (Karney 2013, "Algorithms for geodesics"), with one deliberate
difference in numerical technique:

Karney evaluates the geodesic integrals with 6th-order trigonometric series
in the expansion parameter. Here the same integrals are evaluated directly
with composite Gauss-Legendre quadrature (32 nodes per ≤ π/4 panel —
integrands are analytic, so the error is far below double precision). That
removes ~30 hand-transcribed series coefficients in exchange for a few
dozen extra flops per evaluation, and is exact for any flattening, not just
small ones.

Framework (Karney 2013 §§2-5):
- reduced latitude  tanβ = (1-f)·tanφ, auxiliary-sphere arc σ, longitude ω;
- Clairaut constant sinα0 = sinα·cosβ, k² = e'²·cos²α0;
- distance  s = b·∫ √(1+k²sin²σ) dσ;
- longitude λ = ω − f·sinα0·∫ (2−f)/(1+(1−f)√(1+k²sin²σ)) dσ;
- direct: Newton on σ2 for the distance integral;
- inverse: canonicalize (β1 ≤ 0, |β2| ≤ |β1|, λ12 ∈ [0,π]), then bracketed
  root-find on α1 — monotone on the canonical domain, so it converges for
  every pair including the near-antipodal inputs where Vincenty's fixed
  point iteration famously fails (vincenty_distance.rs:13 documents that
  failure mode).

Polygon area: Green's theorem ∮ q(φ) dλ along the geodesic edges, with the
closed-form authalic integral
    q(φ) = (a²(1−e²)/2)·[ sinφ/(1−e²sin²φ) + atanh(e·sinφ)/e ],
(dq/dφ = a²(1−e²)cosφ/(1−e²sin²φ)², the exact ellipsoid area element), and
λ'(σ) = sinα0/(cos²σ + sin²α0·sin²σ) − f·sinα0·g(σ) integrated per edge by
the same quadrature. CCW rings give positive signed area, matching
geodesic_area_signed's convention.
"""

from __future__ import annotations

import math

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

_GL_X, _GL_W = np.polynomial.legendre.leggauss(32)


def _quad(fn, lo: float, hi: float) -> float:
    """Composite 32-node Gauss-Legendre over panels of ≤ π/4."""
    if lo == hi:
        return 0.0
    n_pan = max(1, int(math.ceil(abs(hi - lo) / (math.pi / 4.0))))
    edges = np.linspace(lo, hi, n_pan + 1)
    total = 0.0
    for i in range(n_pan):
        mid = 0.5 * (edges[i] + edges[i + 1])
        half = 0.5 * (edges[i + 1] - edges[i])
        total += half * float(np.sum(_GL_W * fn(mid + half * _GL_X)))
    return total


class Geodesic:
    """Karney-style geodesic solver for an ellipsoid of revolution."""

    def __init__(self, a: float = WGS84_A, f: float = WGS84_F):
        self.a = a
        self.f = f
        self.b = a * (1.0 - f)
        self.e2 = f * (2.0 - f)
        self.ep2 = self.e2 / (1.0 - self.e2)
        self.e = math.sqrt(self.e2) if self.e2 > 0 else 0.0

    # --- integrals -----------------------------------------------------------

    def _dist_integral(self, k2: float, s0: float, s1: float) -> float:
        return _quad(lambda s: np.sqrt(1.0 + k2 * np.sin(s) ** 2), s0, s1)

    def _lam_integral(self, k2: float, s0: float, s1: float) -> float:
        f = self.f
        return _quad(
            lambda s: (2.0 - f) / (1.0 + (1.0 - f) * np.sqrt(1.0 + k2 * np.sin(s) ** 2)),
            s0,
            s1,
        )

    # --- authalic q ----------------------------------------------------------

    def _q(self, sphi):
        sphi = np.clip(sphi, -1.0, 1.0)
        if self.e2 == 0:
            return self.a * self.a * sphi
        return (self.a * self.a * (1.0 - self.e2) / 2.0) * (
            sphi / (1.0 - self.e2 * sphi * sphi) + np.arctanh(self.e * sphi) / self.e
        )

    def total_area(self) -> float:
        return float(4.0 * math.pi * self._q(1.0) / 2.0) * 2.0

    # --- direct problem ------------------------------------------------------

    def direct(self, lat1: float, lon1: float, azi1: float, s12: float):
        """(lat2, lon2, azi2) after travelling s12 meters on bearing azi1."""
        f, b = self.f, self.b
        phi1 = math.radians(lat1)
        alp1 = math.radians(azi1)
        sbet1 = (1.0 - f) * math.sin(phi1)
        cbet1 = math.cos(phi1)
        norm = math.hypot(sbet1, cbet1)
        sbet1, cbet1 = sbet1 / norm, cbet1 / norm
        salp1, calp1 = math.sin(alp1), math.cos(alp1)
        salp0 = salp1 * cbet1
        calp0 = math.hypot(calp1, salp1 * sbet1)
        k2 = self.ep2 * calp0 * calp0
        sig1 = math.atan2(sbet1, cbet1 * calp1)
        omg1 = math.atan2(salp0 * math.sin(sig1), math.cos(sig1))
        # Newton for sigma2 on the distance integral
        sig2 = sig1 + s12 / (b * math.sqrt(1.0 + k2 * 0.5))
        for _ in range(100):
            g = b * self._dist_integral(k2, sig1, sig2) - s12
            dg = b * math.sqrt(1.0 + k2 * math.sin(sig2) ** 2)
            step = g / dg
            sig2 -= step
            if abs(step) < 1e-15:
                break
        ssig2, csig2 = math.sin(sig2), math.cos(sig2)
        sbet2 = calp0 * ssig2
        cbet2 = math.hypot(salp0, calp0 * csig2)
        phi2 = math.atan2(sbet2, (1.0 - f) * cbet2)
        omg2 = math.atan2(salp0 * ssig2, csig2)
        lam12 = (omg2 - omg1) - f * salp0 * self._lam_integral(k2, sig1, sig2)
        lon2 = lon1 + math.degrees(lam12)
        lon2 = (lon2 + 540.0) % 360.0 - 180.0
        alp2 = math.atan2(salp0, calp0 * csig2)
        return math.degrees(phi2), lon2, math.degrees(alp2)

    # --- inverse problem -----------------------------------------------------

    def _lambda_and_geom(self, sbet1, cbet1, sbet2, cbet2, alp1):
        """λ12 and the geodesic internals for a trial azimuth (canonical)."""
        salp1, calp1 = math.sin(alp1), math.cos(alp1)
        salp0 = salp1 * cbet1
        calp0 = math.hypot(calp1, salp1 * sbet1)
        k2 = self.ep2 * calp0 * calp0
        sig1 = math.atan2(sbet1, cbet1 * calp1)
        omg1 = math.atan2(salp0 * math.sin(sig1), math.cos(sig1))
        # Clairaut at point 2; canonical ordering guarantees salp0 <= cbet2
        salp2 = min(salp0 / cbet2, 1.0) if cbet2 > 0 else 1.0
        calp2 = math.sqrt(max(cbet2 * cbet2 - salp0 * salp0, 0.0)) / cbet2 if cbet2 > 0 else 0.0
        sig2 = math.atan2(sbet2, cbet2 * calp2)
        omg2 = math.atan2(salp0 * math.sin(sig2), math.cos(sig2))
        lam12 = (omg2 - omg1) - self.f * salp0 * self._lam_integral(k2, sig1, sig2)
        return lam12, (salp0, calp0, k2, sig1, sig2, salp2, calp2)

    def inverse(self, lat1: float, lon1: float, lat2: float, lon2: float):
        """(s12 meters, azi1 deg, azi2 deg) — exact for all pairs incl. the
        near-antipodal region (bracketed root-find, no Vincenty divergence)."""
        f, b = self.f, self.b
        lam12 = math.radians(((lon2 - lon1) + 540.0) % 360.0 - 180.0)
        # canonical transforms: lon sign, point swap, lat sign
        lon_sign = 1.0 if lam12 >= 0 else -1.0
        lam12 *= lon_sign

        def rbeta(lat):
            s = (1.0 - f) * math.sin(math.radians(lat))
            c = math.cos(math.radians(lat))
            n = math.hypot(s, c)
            return s / n, max(c / n, 1e-300)

        sbet1, cbet1 = rbeta(lat1)
        sbet2, cbet2 = rbeta(lat2)
        swap = abs(math.atan2(sbet1, cbet1)) < abs(math.atan2(sbet2, cbet2))
        if swap:
            sbet1, cbet1, sbet2, cbet2 = sbet2, cbet2, sbet1, cbet1
        lat_sign = 1.0 if sbet1 <= 0 else -1.0
        sbet1 *= lat_sign
        sbet2 *= lat_sign

        if sbet1 == 0.0 and sbet2 == 0.0 and lam12 <= (1.0 - f) * math.pi:
            # stays on the equator
            s12 = self.a * lam12
            azi1 = azi2 = 90.0
            return self._map_back(s12, azi1, azi2, swap, lat_sign, lon_sign)
        if sbet1 == 0.0:
            sbet1 = -1e-14  # nudge off the degenerate equatorial start

        if lam12 == 0.0:
            # same meridian, no pole crossing: ascend from beta1 to beta2
            k2 = self.ep2
            sig1 = math.atan2(sbet1, cbet1)
            sig2 = math.atan2(sbet2, cbet2)
            s12 = b * self._dist_integral(k2, sig1, sig2)
            return self._map_back(s12, 0.0, 0.0, swap, lat_sign, lon_sign)

        target = lam12

        def h(alp1):
            lam, _ = self._lambda_and_geom(sbet1, cbet1, sbet2, cbet2, alp1)
            return lam - target

        lo, hi = 1e-15, math.pi - 1e-15
        flo, fhi = h(lo), h(hi)
        if flo > 0:
            alp1 = lo
        elif fhi < 0:
            alp1 = hi
        else:
            # Illinois (damped false position): bracket-safe, superlinear —
            # typically ~10 λ-evaluations instead of ~90 bisections
            alp1 = 0.5 * (lo + hi)
            side = 0
            for _ in range(100):
                denom = fhi - flo
                alp1 = (lo * fhi - hi * flo) / denom if denom != 0 else 0.5 * (lo + hi)
                if not lo < alp1 < hi:
                    alp1 = 0.5 * (lo + hi)
                fm = h(alp1)
                if abs(fm) < 1e-15 or (hi - lo) < 1e-15:
                    break
                if fm < 0:
                    lo, flo = alp1, fm
                    if side == -1:
                        fhi *= 0.5
                    side = -1
                else:
                    hi, fhi = alp1, fm
                    if side == 1:
                        flo *= 0.5
                    side = 1
        _, (salp0, calp0, k2, sig1, sig2, salp2, calp2) = self._lambda_and_geom(
            sbet1, cbet1, sbet2, cbet2, alp1
        )
        s12 = b * self._dist_integral(k2, sig1, sig2)
        azi1 = math.degrees(alp1)
        azi2 = math.degrees(math.atan2(salp2, calp2))
        return self._map_back(s12, azi1, azi2, swap, lat_sign, lon_sign)

    @staticmethod
    def _map_back(s12, azi1, azi2, swap, lat_sign, lon_sign):
        if swap:
            # reverse the path: forward azimuth at original point 1 is the
            # back-azimuth of the solved (swapped) geodesic
            azi1, azi2 = 180.0 - azi2, 180.0 - azi1
        if lat_sign < 0:
            azi1, azi2 = 180.0 - azi1, 180.0 - azi2
        if lon_sign < 0:
            azi1, azi2 = -azi1, -azi2
        azi1 = (azi1 + 540.0) % 360.0 - 180.0
        azi2 = (azi2 + 540.0) % 360.0 - 180.0
        return s12, azi1, azi2

    # --- polygon area ---------------------------------------------------------

    def _edge_area(self, lat1, lon1, lat2, lon2):
        """∮ q(φ) dλ along one geodesic edge (plus its length)."""
        s12, azi1, _ = self.inverse(lat1, lon1, lat2, lon2)
        if s12 == 0.0:
            return 0.0, 0.0
        f = self.f
        phi1 = math.radians(lat1)
        alp1 = math.radians(azi1)
        sbet1 = (1.0 - f) * math.sin(phi1)
        cbet1 = math.cos(phi1)
        n = math.hypot(sbet1, cbet1)
        sbet1, cbet1 = sbet1 / n, cbet1 / n
        salp1, calp1 = math.sin(alp1), math.cos(alp1)
        salp0 = salp1 * cbet1
        calp0 = math.hypot(calp1, salp1 * sbet1)
        k2 = self.ep2 * calp0 * calp0
        sig1 = math.atan2(sbet1, cbet1 * calp1)
        # sigma2 from the solved distance (Newton, same as direct())
        sig2 = sig1 + s12 / (self.b * math.sqrt(1.0 + k2 * 0.5))
        for _ in range(100):
            g = self.b * self._dist_integral(k2, sig1, sig2) - s12
            dg = self.b * math.sqrt(1.0 + k2 * math.sin(sig2) ** 2)
            step = g / dg
            sig2 -= step
            if abs(step) < 1e-15:
                break

        one_m_f = 1.0 - f
        salp0_sq = salp0 * salp0

        def integrand(s):
            ss, cs = np.sin(s), np.cos(s)
            sbet = calp0 * ss
            # phi from beta: sinφ = sinβ / sqrt(sin²β + (1-f)²cos²β)
            cbet = np.sqrt(salp0_sq + (calp0 * cs) ** 2)
            sphi = sbet / np.sqrt(sbet * sbet + (one_m_f * cbet) ** 2)
            domg = salp0 / (cs * cs + salp0_sq * ss * ss)
            glam = (2.0 - f) / (1.0 + one_m_f * np.sqrt(1.0 + k2 * ss * ss))
            dlam = domg - f * salp0 * glam
            return self._q(sphi) * dlam

        return _quad(integrand, sig1, sig2), s12

    def polygon_area_perimeter(self, lons, lats):
        """(signed area m², perimeter m) of a geodesic-edged ring.

        CCW (counter-clockwise in lon/lat) rings are positive — the
        geodesic_area_signed convention. The ring may be open or closed.
        Not supported: rings whose edges pass exactly through a pole.
        """
        lons = np.asarray(lons, dtype=np.float64)
        lats = np.asarray(lats, dtype=np.float64)
        if len(lons) >= 2 and lons[0] == lons[-1] and lats[0] == lats[-1]:
            lons, lats = lons[:-1], lats[:-1]
        n = len(lons)
        if n < 3:
            return 0.0, 0.0
        area = 0.0
        perim = 0.0
        lam_winding = 0.0
        for i in range(n):
            j = (i + 1) % n
            a, s = self._edge_area(lats[i], lons[i], lats[j], lons[j])
            area += a
            perim += s
            dlam = math.radians(((lons[j] - lons[i]) + 540.0) % 360.0 - 180.0)
            lam_winding += dlam
        # a ring that winds around a pole accumulates ±2π of longitude:
        # close the Green integral at that pole
        if abs(lam_winding) > math.pi:
            pole_q = float(self._q(1.0 if lam_winding > 0 else -1.0))
            area -= lam_winding / (2.0 * math.pi) * 2.0 * math.pi * pole_q
        # ∮ q dλ is negative for CCW rings; signed-area convention is CCW > 0
        return -area, perim


WGS84 = Geodesic()


def geodesic_inverse(lat1, lon1, lat2, lon2):
    return WGS84.inverse(lat1, lon1, lat2, lon2)


def geodesic_direct(lat1, lon1, azi1, s12):
    return WGS84.direct(lat1, lon1, azi1, s12)


def geodesic_area_signed(lons, lats) -> float:
    return WGS84.polygon_area_perimeter(lons, lats)[0]


def geodesic_area_unsigned(lons, lats) -> float:
    signed = geodesic_area_signed(lons, lats)
    return signed if signed >= 0 else WGS84.total_area() + signed


def geodesic_perimeter(lons, lats) -> float:
    return WGS84.polygon_area_perimeter(lons, lats)[1]


def geodesic_point_at_distance(lat1, lon1, lat2, lon2, meters_from_start):
    """Point ``meters_from_start`` along the geodesic p1→p2 (lon, lat).

    Parity: ``Geodesic.point_at_distance_between`` (geodesic.rs) — the
    bearing of the inverse solution followed by the direct problem.
    """
    if meters_from_start == 0.0:
        return (lon1, lat1)
    _, azi1, _ = WGS84.inverse(lat1, lon1, lat2, lon2)
    plat, plon, _ = WGS84.direct(lat1, lon1, azi1, meters_from_start)
    return (plon, plat)


def geodesic_point_at_ratio(lat1, lon1, lat2, lon2, ratio):
    """Point at ``ratio`` of the geodesic length from p1 (lon, lat)."""
    s12, azi1, _ = WGS84.inverse(lat1, lon1, lat2, lon2)
    if ratio == 0.0 or s12 == 0.0:
        return (lon1, lat1)
    plat, plon, _ = WGS84.direct(lat1, lon1, azi1, ratio * s12)
    return (plon, plat)
