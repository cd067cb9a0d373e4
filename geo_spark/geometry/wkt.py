"""Minimal WKT reader/writer for test fixtures and interop.

Supports POINT / LINESTRING / POLYGON / MULTIPOINT / MULTILINESTRING /
MULTIPOLYGON (2-D). Returns plain numpy structures:

- POINT → ("Point", np.ndarray (2,))
- LINESTRING → ("LineString", np.ndarray (m, 2))
- POLYGON → ("Polygon", [ring0, ring1, ...]) with each ring (m, 2)
- MULTI* → ("MultiX", [member, ...])

This mirrors the reference's use of WKT purely as a fixture format
(``geo-test-fixtures/src/lib.rs``); it is not a general OGC parser.
"""

from __future__ import annotations

import re

import numpy as np

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?|NaN|[-+]?Inf(?:inity)?"


def _parse_coord_seq(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        nums = re.findall(_NUM, pair)
        if len(nums) < 2:
            raise ValueError(f"bad coordinate: {pair!r}")
        pts.append((float(nums[0]), float(nums[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_groups(body: str) -> list[str]:
    """Split on top-level commas between parenthesized groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def parse_wkt(text: str):
    text = text.strip()
    if re.match(r"^\s*GEOMETRYCOLLECTION\s+EMPTY\s*$", text, re.I):
        return "GeometryCollection", []
    m = re.match(r"^\s*(\w+)\s*\((.*)\)\s*$", text, re.S)
    if not m:
        raise ValueError(f"cannot parse WKT: {text[:80]!r}")
    tag = m.group(1).upper()
    body = m.group(2)
    if tag == "GEOMETRYCOLLECTION":
        # split on depth-0 commas; each member is a full WKT geometry
        members, depth, start = [], 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                members.append(body[start:i])
                start = i + 1
        members.append(body[start:])
        parsed = []
        for mtxt in members:
            mtxt = mtxt.strip()
            if not mtxt or re.match(r"^\w+\s+EMPTY$", mtxt, re.I) or mtxt.upper() == "EMPTY":
                continue
            parsed.append(parse_wkt(mtxt))
        return "GeometryCollection", parsed
    if tag == "POINT":
        return "Point", _parse_coord_seq(body)[0]
    if tag in ("LINESTRING", "LINEARRING"):
        return "LineString", _parse_coord_seq(body)
    if tag == "POLYGON":
        return "Polygon", [_parse_coord_seq(g) for g in _split_groups(body)]
    if tag == "MULTIPOINT":
        groups = _split_groups(body)
        if groups:
            return "MultiPoint", np.asarray([_parse_coord_seq(g)[0] for g in groups])
        return "MultiPoint", _parse_coord_seq(body)
    if tag == "MULTILINESTRING":
        return "MultiLineString", [_parse_coord_seq(g) for g in _split_groups(body)]
    if tag == "MULTIPOLYGON":
        polys = []
        depth, start = 0, None
        for i, ch in enumerate(body):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    inner = body[start + 1 : i]
                    polys.append([_parse_coord_seq(g) for g in _split_groups(inner)])
        return "MultiPolygon", polys
    raise ValueError(f"unsupported WKT type: {tag}")


def _fmt(v: float) -> str:
    return repr(float(v))


def to_wkt(kind: str, data) -> str:
    def seq(arr):
        return ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in np.asarray(arr))

    if kind == "Point":
        return f"POINT({_fmt(data[0])} {_fmt(data[1])})"
    if kind == "LineString":
        return f"LINESTRING({seq(data)})"
    if kind == "Polygon":
        rings = ",".join(f"({seq(r)})" for r in data)
        return f"POLYGON({rings})"
    if kind == "MultiPolygon":
        polys = ",".join("(" + ",".join(f"({seq(r)})" for r in p) + ")" for p in data)
        return f"MULTIPOLYGON({polys})"
    raise ValueError(f"unsupported kind: {kind}")
