"""Map projections — the engine's analogue of the reference's `proj.rs`
surface (``geo/src/algorithm/proj.rs`` re-exports the external proj crate;
this module implements the common CRS transforms from the published
formulas instead of binding a C library).

- Web Mercator (EPSG:3857) ⇄ WGS84: spherical closed forms.
- UTM (EPSG:326xx/327xx) ⇄ WGS84: transverse Mercator via the 6th-order
  Krüger series in n (Karney 2011, "Transverse Mercator with an accuracy
  of a few nanometers" — public-domain coefficients), k0 = 0.9996,
  E0 = 500 km, N0 = 0 / 10 000 km.

All functions are vectorized numpy; accuracy is verified against
independent invariants (meridian-arc northing from the engine's own Karney
geodesic, central-meridian scale, sub-mm round-trips).
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0

_n = WGS84_F / (2.0 - WGS84_F)
_A = WGS84_A / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0 + _n**6 / 256.0)
_E = np.sqrt(2.0 * WGS84_F - WGS84_F**2)  # first eccentricity

_ALPHA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
        - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
        13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
        - 1983433 * _n**6 / 1935360,
        61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
        + 167603 * _n**6 / 181440,
        49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
        34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
        212378941 * _n**6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
        - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
        _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
        - 1118711 * _n**6 / 3870720,
        17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
        + 5569 * _n**6 / 90720,
        4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
        4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
        20648693 * _n**6 / 638668800,
    ]
)
# conformal → geodetic latitude series (in n)
_CHI = np.array(
    [
        2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45,
        7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45,
        56 * _n**3 / 15 - 136 * _n**4 / 35,
        4279 * _n**4 / 630,
    ]
)


def utm_zone(lon, lat=None):
    """Standard 6° UTM zone number (1..60) for a longitude array."""
    lon = np.asarray(lon, dtype=np.float64)
    z = np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1
    return np.clip(z, 1, 60)


def _central_meridian(zone):
    return np.asarray(zone, dtype=np.float64) * 6.0 - 183.0


def tm_forward(lon, lat, lon0):
    """Transverse Mercator forward (unscaled ξ, η in A units → meters via
    k0·A): returns (easting_from_E0, northing_from_equator) in meters."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon - lon0)
    phi = np.radians(lat)
    s = np.sin(phi)
    t = np.sinh(
        np.arctanh(s) - (2.0 * np.sqrt(_n) / (1.0 + _n))
        * np.arctanh((2.0 * np.sqrt(_n) / (1.0 + _n)) * s)
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    return _K0 * _A * eta, _K0 * _A * xi


def tm_inverse(x, y, lon0):
    """Transverse Mercator inverse of ``tm_forward`` → (lon, lat) degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xi = y / (_K0 * _A)
    eta = x / (_K0 * _A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p -= _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    phi = chi.copy()
    for j in range(4):
        phi += _CHI[j] * np.sin(2.0 * (j + 1) * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0 + np.degrees(lam), np.degrees(phi)


def utm_forward(lon, lat, zone=None):
    """(easting, northing, zone, south) — standard UTM with false origins."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if zone is None:
        zone = utm_zone(lon)
    zone = np.asarray(zone, dtype=np.int64)
    e, nmer = tm_forward(lon, lat, _central_meridian(zone))
    south = lat < 0
    northing = nmer + np.where(south, 10000000.0, 0.0)
    return e + _E0, northing, zone, south


def utm_inverse(easting, northing, zone, south):
    """(lon, lat) from standard UTM coordinates."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    south = np.asarray(south, dtype=bool)
    y = northing - np.where(south, 10000000.0, 0.0)
    return tm_inverse(easting - _E0, y, _central_meridian(zone))


# --- Web Mercator (EPSG:3857) -------------------------------------------------

def web_mercator_forward(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = WGS84_A * np.radians(lon)
    y = WGS84_A * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def web_mercator_inverse(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WGS84_A)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2.0)
    return lon, lat
