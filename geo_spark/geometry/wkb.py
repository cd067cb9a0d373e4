"""WKB (well-known binary) reader/writer — the interop column format.

SURVEY §1.5 names WKB ``BinaryType`` as the interchange column for real
geoparquet inputs; the reference's equivalent surface is the flat-binary
geometry access of ``geo-traits`` (``geo-traits/src/lib.rs:1-16``). Supports
the same kinds as the WKT module (2-D Point / LineString / Polygon /
MultiPoint / MultiLineString / MultiPolygon), both byte orders on read,
little-endian on write, and round-trips the (kind, data) structures of
``geo_spark.geometry.wkt`` exactly.

The Spark surface (``polygon_from_wkb``) decodes a BinaryType column into
the engine's array<struct<x,y>> ring columns with one vectorized pandas UDF
— geometry lands in columnar form once at the scan edge and every
downstream operator stays on the native columns.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_PT, _LS, _PG, _MPT, _MLS, _MPG, _GC = 1, 2, 3, 4, 5, 6, 7

# EWKB (PostGIS) dimensionality / SRID flag bits on the 32-bit type word.
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, fmt: str):
        out = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return out

    def coords(self, n: int, bo: str, dim: int = 2) -> np.ndarray:
        """Read n points of `dim` doubles each; return the 2-D (x, y) slice."""
        arr = np.frombuffer(
            self.buf, dtype=("<f8" if bo == "<" else ">f8"), count=dim * n, offset=self.pos
        )
        self.pos += 8 * dim * n
        return arr.reshape(n, dim)[:, :2].astype(np.float64)


def _read_geom(r: _Reader):
    (order,) = r.take("B")
    bo = "<" if order == 1 else ">"
    (raw,) = r.take(bo + "I")
    # Decode EWKB flag bits (PostGIS) and ISO/SQL-MM 1000-offset type codes;
    # Z/M coordinates are read and stripped, SRID words are skipped.
    gtype = raw & 0x0FFFFFFF
    dim = 2
    if raw & _EWKB_Z:
        dim += 1
    if raw & _EWKB_M:
        dim += 1
    if gtype >= 1000:  # ISO: 1000=Z, 2000=M, 3000=ZM
        iso = gtype // 1000
        gtype %= 1000
        if iso in (1, 2):
            dim += 1
        elif iso == 3:
            dim += 2
        else:
            raise ValueError(f"unsupported ISO WKB type offset: {iso * 1000}")
    if raw & _EWKB_SRID:
        r.take(bo + "I")  # skip SRID
    if gtype == _PT:
        xy = r.coords(1, bo, dim)[0]
        return ("Point", np.array([xy[0], xy[1]], dtype=np.float64))
    if gtype == _LS:
        (n,) = r.take(bo + "I")
        return ("LineString", r.coords(n, bo, dim))
    if gtype == _PG:
        (nr,) = r.take(bo + "I")
        rings = []
        for _ in range(nr):
            (n,) = r.take(bo + "I")
            rings.append(r.coords(n, bo, dim))
        return ("Polygon", rings)
    if gtype in (_MPT, _MLS, _MPG):
        (n,) = r.take(bo + "I")
        members = [_read_geom(r) for _ in range(n)]
        if gtype == _MPT:
            return ("MultiPoint", [m[1] for m in members])
        if gtype == _MLS:
            return ("MultiLineString", [m[1] for m in members])
        return ("MultiPolygon", [m[1] for m in members])
    if gtype == _GC:
        (n,) = r.take(bo + "I")
        return ("GeometryCollection", [_read_geom(r) for _ in range(n)])
    raise ValueError(f"unsupported WKB geometry type: {gtype}")


def parse_wkb(buf: bytes):
    """bytes → (kind, data), same structures as geometry.wkt.parse_wkt."""
    return _read_geom(_Reader(bytes(buf)))


def _w_coords(out: bytearray, arr: np.ndarray):
    out += np.ascontiguousarray(np.asarray(arr, dtype="<f8")).tobytes()


def _write_geom(g, out: bytearray):
    kind, data = g
    out.append(1)  # little-endian
    if kind == "Point":
        out += struct.pack("<I", _PT)
        out += struct.pack("<dd", float(data[0]), float(data[1]))
    elif kind == "LineString":
        arr = np.asarray(data, dtype=np.float64)
        out += struct.pack("<II", _LS, len(arr))
        _w_coords(out, arr)
    elif kind == "Polygon":
        out += struct.pack("<II", _PG, len(data))
        for ring in data:
            ring = np.asarray(ring, dtype=np.float64)
            out += struct.pack("<I", len(ring))
            _w_coords(out, ring)
    elif kind in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        code = {"MultiPoint": _MPT, "MultiLineString": _MLS, "MultiPolygon": _MPG}[kind]
        out += struct.pack("<II", code, len(data))
        sub = {"MultiPoint": "Point", "MultiLineString": "LineString", "MultiPolygon": "Polygon"}[kind]
        for m in data:
            _write_geom((sub, m), out)
    elif kind == "GeometryCollection":
        out += struct.pack("<II", _GC, len(data))
        for member in data:
            _write_geom(member, out)
    else:
        raise ValueError(f"unsupported kind: {kind}")


def to_wkb(g) -> bytes:
    """(kind, data) → little-endian ISO WKB bytes."""
    out = bytearray()
    _write_geom(g, out)
    return bytes(out)


# --- Spark surface -------------------------------------------------------------


def polygon_wkb_roundtrip(ext_col, ints_col):
    """struct<n_bytes,n_vertices,sum_x,sum_y,ok>: encode a polygon column to
    WKB, decode it back, and report the decoded structure plus byte-exact
    coordinate equality (``ok``). The closed-form byte length
    (9 + 4·n_rings + 16·Σ ring sizes) and the coordinate sums make the full
    binary round-trip oracle-checkable in plain SQL.
    """
    from pyspark.sql import functions as F

    @F.pandas_udf("struct<n_bytes:int,n_vertices:int,sum_x:double,sum_y:double,ok:boolean>")
    def udf(exts: pd.Series, ints: pd.Series) -> pd.DataFrame:
        nb, nv, sx, sy, ok = [], [], [], [], []
        for i in range(len(exts)):
            ext = np.asarray([(c["x"], c["y"]) for c in exts.iloc[i]], dtype=np.float64)
            ivals = ints.iloc[i]
            if ivals is None:
                ivals = []
            holes = [
                np.asarray([(c["x"], c["y"]) for c in ring], dtype=np.float64)
                for ring in ivals
            ]
            g = ("Polygon", [ext] + holes)
            buf = to_wkb(g)
            kind, rings = parse_wkb(buf)
            allc = np.vstack(rings) if rings else np.empty((0, 2))
            same = (
                kind == "Polygon"
                and len(rings) == 1 + len(holes)
                and all(
                    a.shape == b.shape and (a == b).all()
                    for a, b in zip(rings, [ext] + holes)
                )
            )
            nb.append(len(buf))
            nv.append(len(allc))
            sx.append(float(allc[:, 0].sum()))
            sy.append(float(allc[:, 1].sum()))
            ok.append(bool(same))
        return pd.DataFrame(
            {"n_bytes": nb, "n_vertices": nv, "sum_x": sx, "sum_y": sy, "ok": ok}
        )

    from pyspark.sql import functions as F

    e = ext_col if not isinstance(ext_col, str) else F.col(ext_col)
    h = ints_col if not isinstance(ints_col, str) else F.col(ints_col)
    return udf(e, h)


def polygon_from_wkb(wkb_col):
    """BinaryType column of WKB polygons → struct(exterior, interiors).

    MultiPolygons with one member decode to that member; others raise (use
    a multipolygon-aware scan for true multi inputs). NULL-safe.
    """
    from pyspark.sql import functions as F

    @F.pandas_udf(
        "struct<exterior:array<struct<x:double,y:double>>,"
        "interiors:array<array<struct<x:double,y:double>>>>"
    )
    def udf(bufs: pd.Series) -> pd.DataFrame:
        exts, ints = [], []
        for b in bufs:
            if b is None:
                exts.append(None)
                ints.append(None)
                continue
            kind, data = parse_wkb(b)
            if kind == "MultiPolygon" and len(data) == 1:
                kind, data = "Polygon", data[0]
            if kind != "Polygon":
                raise ValueError(f"expected WKB Polygon, got {kind}")
            exts.append([{"x": float(x), "y": float(y)} for x, y in data[0]])
            ints.append(
                [[{"x": float(x), "y": float(y)} for x, y in ring] for ring in data[1:]]
            )
        return pd.DataFrame({"exterior": exts, "interiors": ints})

    col = wkb_col if not isinstance(wkb_col, str) else F.col(wkb_col)
    return udf(col)
