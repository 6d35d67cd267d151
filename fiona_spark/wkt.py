"""WKT codec — parse Well-Known Text (curve types included) into the
engine's GeoJSON-style geometry dicts, with the same normalization the
WKB codec applies (reference behavior: GDAL RFC 49 linearization,
`fiona/_geometry.pyx:211-263`; driven by
`/root/reference/tests/test_curve_geometries.py` over curves_line.csv):

  * CIRCULARSTRING -> LineString (arcs densified by
    :func:`fiona_spark.wkb._linearize_arcs`)
  * COMPOUNDCURVE  -> LineString (segments stitched, junction vertex
    deduplicated)
  * CURVEPOLYGON   -> Polygon, MULTICURVE -> MultiLineString,
    MULTISURFACE -> MultiPolygon, TRIANGLE -> Polygon,
    TIN / POLYHEDRALSURFACE -> MultiPolygon
  * Z kept, M parsed-then-dropped (ZM -> XYZ, M -> XY)

``encode`` writes canonical WKT for the GeoJSON types (the inverse for
round-trips).
"""

from __future__ import annotations

import re

import numpy as np

from .wkb import WKBError, _linearize_arcs


class WKTError(ValueError):
    pass


_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


class _P:
    def __init__(self, text: str):
        self.toks = _TOKEN.findall(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise WKTError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise WKTError(f"expected {t!r}, got {got!r}")


def _dims(p: _P) -> tuple[bool, bool]:
    t = p.peek()
    if t and t.upper() in ("Z", "M", "ZM"):
        p.next()
        u = t.upper()
        return "Z" in u, "M" in u
    return False, False


def _coords(p: _P, has_z, has_m):
    """One coordinate tuple (numbers until , or ))."""
    vals = []
    while p.peek() not in (",", ")", None):
        vals.append(float(p.next()))
    if len(vals) < 2:
        raise WKTError(f"coordinate needs >= 2 numbers, got {vals}")
    if has_m and not has_z:
        return vals[:2]                       # M-only: drop the measure
    if has_z or (not has_m and len(vals) == 3):
        # explicit Z, or classic bare-XYZ WKT (no dim marker)
        return vals[:3] if len(vals) >= 3 else vals[:2]
    return vals[:2]                           # ZM keeps XYZ via has_z


def _coord_list(p: _P, has_z, has_m):
    p.expect("(")
    pts = [_coords(p, has_z, has_m)]
    while p.peek() == ",":
        p.next()
        pts.append(_coords(p, has_z, has_m))
    p.expect(")")
    return pts


def _linearize(pts: list) -> list:
    arr = np.asarray([pt[:2] for pt in pts], np.float64)
    return [list(map(float, q)) for q in _linearize_arcs(arr)]


def _segment(p: _P, has_z, has_m):
    """A COMPOUNDCURVE segment: bare coord list (implicit linestring)
    or CIRCULARSTRING(...)."""
    t = p.peek()
    if t == "(":
        return _coord_list(p, has_z, has_m)
    word = p.next().upper()
    if word != "CIRCULARSTRING":
        raise WKTError(f"unsupported compound segment {word!r}")
    z2, m2 = _dims(p)
    return _linearize(_coord_list(p, has_z or z2, has_m or m2))


def _compound(p: _P, has_z, has_m):
    p.expect("(")
    pts = list(_segment(p, has_z, has_m))
    while p.peek() == ",":
        p.next()
        seg = _segment(p, has_z, has_m)
        if pts and seg and pts[-1][:2] == seg[0][:2]:
            seg = seg[1:]                     # shared junction vertex
        pts.extend(seg)
    p.expect(")")
    return pts


def _curve_member(p: _P, has_z, has_m):
    """MULTICURVE member / CURVEPOLYGON ring: bare list,
    CIRCULARSTRING or COMPOUNDCURVE."""
    t = p.peek()
    if t == "(":
        return _coord_list(p, has_z, has_m)
    word = p.next().upper()
    z2, m2 = _dims(p)
    if word == "CIRCULARSTRING":
        return _linearize(_coord_list(p, has_z or z2, has_m or m2))
    if word == "COMPOUNDCURVE":
        return _compound(p, has_z or z2, has_m or m2)
    raise WKTError(f"unsupported curve member {word!r}")


def _poly_body(p: _P, has_z, has_m):
    p.expect("(")
    rings = [_coord_list(p, has_z, has_m)]
    while p.peek() == ",":
        p.next()
        rings.append(_coord_list(p, has_z, has_m))
    p.expect(")")
    return rings


def _geometry(p: _P) -> dict:
    word = p.next().upper()
    has_z, has_m = _dims(p)
    if p.peek() and p.peek().upper() == "EMPTY":
        p.next()
        if word in ("POINT",):
            return {"type": "Point", "coordinates": []}
        base = {"MULTIPOINT": "MultiPoint", "LINESTRING": "LineString",
                "POLYGON": "Polygon",
                "MULTILINESTRING": "MultiLineString",
                "MULTIPOLYGON": "MultiPolygon",
                "GEOMETRYCOLLECTION": "GeometryCollection"}
        return {"type": base.get(word, word.title()), "coordinates": []}
    if word == "POINT":
        p.expect("(")
        c = _coords(p, has_z, has_m)
        p.expect(")")
        return {"type": "Point", "coordinates": c}
    if word == "LINESTRING":
        return {"type": "LineString",
                "coordinates": _coord_list(p, has_z, has_m)}
    if word == "CIRCULARSTRING":
        return {"type": "LineString",
                "coordinates": _linearize(_coord_list(p, has_z, has_m))}
    if word == "COMPOUNDCURVE":
        return {"type": "LineString",
                "coordinates": _compound(p, has_z, has_m)}
    if word in ("POLYGON", "TRIANGLE"):
        return {"type": "Polygon",
                "coordinates": _poly_body(p, has_z, has_m)}
    if word == "CURVEPOLYGON":
        p.expect("(")
        rings = [_curve_member(p, has_z, has_m)]
        while p.peek() == ",":
            p.next()
            rings.append(_curve_member(p, has_z, has_m))
        p.expect(")")
        return {"type": "Polygon", "coordinates": rings}
    if word == "MULTIPOINT":
        p.expect("(")
        pts = []
        while True:
            if p.peek() == "(":           # ((1 2), (3 4)) form
                p.expect("(")
                pts.append(_coords(p, has_z, has_m))
                p.expect(")")
            else:                         # (1 2, 3 4) form
                pts.append(_coords(p, has_z, has_m))
            if p.peek() == ",":
                p.next()
                continue
            break
        p.expect(")")
        return {"type": "MultiPoint", "coordinates": pts}
    if word in ("MULTILINESTRING", "MULTICURVE"):
        p.expect("(")
        parts = [_curve_member(p, has_z, has_m)]
        while p.peek() == ",":
            p.next()
            parts.append(_curve_member(p, has_z, has_m))
        p.expect(")")
        return {"type": "MultiLineString", "coordinates": parts}
    if word in ("MULTIPOLYGON", "TIN", "POLYHEDRALSURFACE"):
        p.expect("(")
        polys = [_poly_body(p, has_z, has_m)]
        while p.peek() == ",":
            p.next()
            polys.append(_poly_body(p, has_z, has_m))
        p.expect(")")
        return {"type": "MultiPolygon", "coordinates": polys}
    if word == "MULTISURFACE":
        p.expect("(")
        polys = []
        while True:
            if p.peek() == "(":
                polys.append(_poly_body(p, has_z, has_m))
            else:
                sub = _geometry_from_word(p)
                if sub["type"] != "Polygon":
                    raise WKTError("MULTISURFACE member must be areal")
                polys.append(sub["coordinates"])
            if p.peek() == ",":
                p.next()
                continue
            break
        p.expect(")")
        return {"type": "MultiPolygon", "coordinates": polys}
    if word == "GEOMETRYCOLLECTION":
        p.expect("(")
        geoms = [_geometry(p)]
        while p.peek() == ",":
            p.next()
            geoms.append(_geometry(p))
        p.expect(")")
        return {"type": "GeometryCollection", "geometries": geoms}
    raise WKTError(f"unsupported WKT type {word!r}")


def _geometry_from_word(p: _P) -> dict:
    return _geometry(p)


def decode(text: str) -> dict:
    """WKT -> geometry dict (curves linearized, M dropped)."""
    p = _P(text)
    g = _geometry(p)
    if p.peek() is not None:
        raise WKTError(f"trailing tokens from {p.peek()!r}")
    return g


def _fmt(c) -> str:
    return " ".join(repr(float(v)) for v in c)


def encode(g: dict) -> str:
    """Geometry dict -> canonical WKT (GeoJSON types)."""
    t = g["type"]
    c = g.get("coordinates")
    if t == "GeometryCollection":
        inner = ", ".join(encode(m) for m in g["geometries"])
        return f"GEOMETRYCOLLECTION ({inner})"
    if not c and c != [0, 0]:
        return f"{t.upper()} EMPTY"
    if t == "Point":
        return f"POINT ({_fmt(c)})"
    if t in ("LineString", "MultiPoint"):
        return (f"{t.upper()} (" + ", ".join(_fmt(p_) for p_ in c) + ")")
    if t in ("Polygon", "MultiLineString"):
        rings = ", ".join(
            "(" + ", ".join(_fmt(p_) for p_ in ring) + ")" for ring in c)
        return f"{t.upper()} ({rings})"
    if t == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join(
                "(" + ", ".join(_fmt(p_) for p_ in ring) + ")"
                for ring in poly) + ")" for poly in c)
        return f"MULTIPOLYGON ({polys})"
    raise WKTError(f"cannot encode type {t!r}")
