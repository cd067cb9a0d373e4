"""Column surface for ellipsoidal geodesic measures (Karney parity).

Reference: ``Geodesic`` distance/bearing/destination
(``line_measures/metric_spaces/geodesic.rs``) and ``GeodesicArea``
(``geodesic_area.rs``). The kernels (kernels/geodesic.py) solve the exact
direct/inverse problems; these wrappers run them per Arrow batch. The
inverse problem is inherently iterative per row (bracketed root-find on the
departure azimuth), so this is a pandas UDF by necessity, not a shortcut —
the haversine/rhumb columns remain pure SQL for the spherical fast path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def geodesic_meters(lon1, lat1, lon2, lat2) -> Column:
    """WGS84 geodesic distance (meters) — exact everywhere incl. antipodes."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (lon1, lat1, lon2, lat2)]

    @F.pandas_udf(T.DoubleType())
    def udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        from geo_spark.kernels.geodesic import WGS84

        out = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            out[i] = WGS84.inverse(b.iloc[i], a.iloc[i], d.iloc[i], c.iloc[i])[0]
        return pd.Series(out)

    return udf(*cols)


def geodesic_bearing_deg(lon1, lat1, lon2, lat2) -> Column:
    """Initial geodesic azimuth, normalized to [0, 360) like the reference."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (lon1, lat1, lon2, lat2)]

    @F.pandas_udf(T.DoubleType())
    def udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        from geo_spark.kernels.geodesic import WGS84

        out = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            out[i] = (WGS84.inverse(b.iloc[i], a.iloc[i], d.iloc[i], c.iloc[i])[1] + 360.0) % 360.0
        return pd.Series(out)

    return udf(*cols)


def geodesic_destination(lon, lat, bearing_deg, dist_m) -> Column:
    """struct(lon, lat) after travelling dist_m on the geodesic."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (lon, lat, bearing_deg, dist_m)]

    @F.pandas_udf("struct<lon:double,lat:double>")
    def udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.DataFrame:
        from geo_spark.kernels.geodesic import WGS84

        lons = np.empty(len(a), dtype=np.float64)
        lats = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            lat2, lon2, _ = WGS84.direct(b.iloc[i], a.iloc[i], c.iloc[i], d.iloc[i])
            lons[i], lats[i] = lon2, lat2
        return pd.DataFrame({"lon": lons, "lat": lats})

    return udf(*cols)


def geodesic_area_signed_col(ring: Column) -> Column:
    """Signed WGS84 area (m², CCW positive) of a ring column."""

    @F.pandas_udf(T.DoubleType())
    def udf(rings: pd.Series) -> pd.Series:
        from geo_spark.kernels.geodesic import WGS84

        out = np.empty(len(rings), dtype=np.float64)
        for i, r in enumerate(rings):
            lons = np.asarray([c["x"] for c in r], dtype=np.float64)
            lats = np.asarray([c["y"] for c in r], dtype=np.float64)
            out[i] = WGS84.polygon_area_perimeter(lons, lats)[0]
        return pd.Series(out)

    return udf(ring)


def geodesic_perimeter_col(ring: Column) -> Column:
    """WGS84 geodesic perimeter (m) of a ring column."""

    @F.pandas_udf(T.DoubleType())
    def udf(rings: pd.Series) -> pd.Series:
        from geo_spark.kernels.geodesic import WGS84

        out = np.empty(len(rings), dtype=np.float64)
        for i, r in enumerate(rings):
            lons = np.asarray([c["x"] for c in r], dtype=np.float64)
            lats = np.asarray([c["y"] for c in r], dtype=np.float64)
            out[i] = WGS84.polygon_area_perimeter(lons, lats)[1]
        return pd.Series(out)

    return udf(ring)
