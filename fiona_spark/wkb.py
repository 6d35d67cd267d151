"""WKB (well-known binary) geometry codec — the engine's interchange
format for external data.

The reference round-trips every geometry through GDAL's WKB importer/
exporter (`fiona/_geometry.pyx:96-103` OGR_G_ImportFromWkb, `:374-380`
geometryRT) and its test matrix covers all GeoJSON types
(`tests/test_geometry.py:38-150`).  This module is the from-scratch
equivalent: a little-endian WKB reader/writer over GeoJSON-style nested
coordinate lists, plus adapters to the engine's flat ring model
(rings_xs/rings_ys) used by the PIP kernels.

Coordinates are parsed in bulk with ``numpy.frombuffer`` (one memcpy
per ring, not one struct.unpack per vertex); the per-geometry header
walk is plain Python — WKB is an ingest/egress format here, not a hot
join path.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    WKB_POINT: "Point", WKB_LINESTRING: "LineString",
    WKB_POLYGON: "Polygon", WKB_MULTIPOINT: "MultiPoint",
    WKB_MULTILINESTRING: "MultiLineString", WKB_MULTIPOLYGON: "MultiPolygon",
    WKB_GEOMETRYCOLLECTION: "GeometryCollection",
}
TYPE_CODES = {v: k for k, v in TYPE_NAMES.items()}
# 3D (Z) variants: reference normalizes the OGR 2.5D flag (0x80000000)
# and ISO +1000 codes to a has_z bool (fiona/_geometry.pyx:47-92)
_ISO_Z = 1000
_OGR_25D = 0x80000000


class WKBError(ValueError):
    """Malformed WKB payload."""


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_header(buf: memoryview, off: int):
    if off + 5 > len(buf):
        raise WKBError("truncated header")
    byte_order = buf[off]
    fmt = "<I" if byte_order == 1 else ">I"
    (raw,) = struct.unpack_from(fmt, buf, off + 1)
    has_z = bool(raw & _OGR_25D) or (1000 <= (raw & 0x0FFFFFFF) < 2000)
    code = (raw & 0x0FFFFFFF) % _ISO_Z if raw & 0x0FFFFFFF >= _ISO_Z \
        else raw & 0x7FFFFFFF
    return byte_order == 1, code, has_z, off + 5


def _read_coords(buf: memoryview, off: int, n: int, little: bool, ndim: int):
    nbytes = n * ndim * 8
    if off + nbytes > len(buf):
        raise WKBError("truncated coordinates")
    dt = "<f8" if little else ">f8"
    arr = np.frombuffer(buf, dtype=dt, count=n * ndim, offset=off)
    return arr.reshape(n, ndim), off + nbytes


def _read_count(buf: memoryview, off: int, little: bool):
    (n,) = struct.unpack_from("<I" if little else ">I", buf, off)
    return n, off + 4


def _decode_body(buf: memoryview, off: int):
    little, code, has_z, off = _read_header(buf, off)
    ndim = 3 if has_z else 2
    if code == WKB_POINT:
        pts, off = _read_coords(buf, off, 1, little, ndim)
        return TYPE_NAMES[code], pts[0].tolist(), off
    if code == WKB_LINESTRING:
        n, off = _read_count(buf, off, little)
        pts, off = _read_coords(buf, off, n, little, ndim)
        return TYPE_NAMES[code], pts.tolist(), off
    if code == WKB_POLYGON:
        n_rings, off = _read_count(buf, off, little)
        rings = []
        for _ in range(n_rings):
            n, off = _read_count(buf, off, little)
            pts, off = _read_coords(buf, off, n, little, ndim)
            rings.append(pts.tolist())
        return TYPE_NAMES[code], rings, off
    if code in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                WKB_GEOMETRYCOLLECTION):
        n_parts, off = _read_count(buf, off, little)
        parts, types = [], []
        for _ in range(n_parts):
            t, coords, off = _decode_body(buf, off)
            types.append(t)
            parts.append(coords if code != WKB_GEOMETRYCOLLECTION
                         else {"type": t, "coordinates": coords})
        return TYPE_NAMES[code], parts, off
    raise WKBError(f"unsupported wkb type code {code}")


def decode(data: bytes) -> dict:
    """WKB bytes -> {'type': GeoJSON type, 'coordinates': nested lists}.

    GeometryCollection coordinates are a list of member geometry dicts
    (mirroring fiona.model.Geometry.geometries).
    """
    t, coords, off = _decode_body(memoryview(data), 0)
    if off != len(data):
        raise WKBError(f"{len(data) - off} trailing bytes")
    return {"type": t, "coordinates": coords}


# ---------------------------------------------------------------------------
# encode (little-endian, 2D / 3D from coordinate arity)
# ---------------------------------------------------------------------------

def _enc_coords(out: list, pts) -> None:
    arr = np.asarray(pts, dtype="<f8")
    out.append(struct.pack("<I", arr.shape[0]))
    out.append(arr.tobytes())


def _encode_body(g: dict, out: list) -> None:
    t = g["type"]
    coords = g.get("coordinates")
    if t == "GeometryCollection":
        members = g.get("geometries", coords or [])
        out.append(struct.pack("<BI", 1, WKB_GEOMETRYCOLLECTION))
        out.append(struct.pack("<I", len(members)))
        for m in members:
            _encode_body(m, out)
        return
    code = TYPE_CODES[t]
    first = coords
    while isinstance(first, (list, tuple)) and first and \
            isinstance(first[0], (list, tuple)):
        first = first[0]
    ndim = len(first) if isinstance(first, (list, tuple)) else len(coords)
    iso = code + _ISO_Z if ndim == 3 else code
    out.append(struct.pack("<BI", 1, iso))
    if t == "Point":
        out.append(np.asarray(coords, dtype="<f8").tobytes())
    elif t == "LineString":
        _enc_coords(out, coords)
    elif t == "Polygon":
        out.append(struct.pack("<I", len(coords)))
        for ring in coords:
            _enc_coords(out, ring)
    elif t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        member_t = t[5:]
        out.append(struct.pack("<I", len(coords)))
        for part in coords:
            _encode_body({"type": member_t, "coordinates": part}, out)
    else:
        raise WKBError(f"unsupported type {t}")


def encode(g: dict) -> bytes:
    """{'type', 'coordinates'} -> little-endian (ISO for 3D) WKB bytes."""
    out: list = []
    _encode_body(g, out)
    return b"".join(out)


# ---------------------------------------------------------------------------
# adapters to the engine ring model
# ---------------------------------------------------------------------------

def to_rings(g: dict):
    """GeoJSON geometry -> (rings_xs, rings_ys) for the even-odd PIP
    kernels: Polygon rings (shell + holes) and MultiPolygon parts all
    flatten into one ring list (parity composes).  Points/LineStrings
    degrade to a single open 'ring' of their vertices."""
    t, c = g["type"], g["coordinates"]
    if t == "Point":
        return [[float(c[0])]], [[float(c[1])]]
    if t in ("LineString", "MultiPoint"):
        xs = [float(p[0]) for p in c]
        ys = [float(p[1]) for p in c]
        return [xs], [ys]
    if t == "Polygon":
        return ([[float(p[0]) for p in ring] for ring in c],
                [[float(p[1]) for p in ring] for ring in c])
    if t == "MultiLineString":
        return ([[float(p[0]) for p in line] for line in c],
                [[float(p[1]) for p in line] for line in c])
    if t == "MultiPolygon":
        xs, ys = [], []
        for poly in c:
            for ring in poly:
                xs.append([float(p[0]) for p in ring])
                ys.append([float(p[1]) for p in ring])
        return xs, ys
    raise WKBError(f"no ring model for {t}")


def promote_multi(g: dict) -> dict:
    """Polygon -> MultiPolygon (etc.) promotion, as the reference applies
    on heterogeneous writes (fiona/collection.py:699-720)."""
    t = g["type"]
    if t in ("Point", "LineString", "Polygon"):
        return {"type": f"Multi{t}", "coordinates": [g["coordinates"]]}
    return g


RINGS_STRUCT = T.StructType([
    T.StructField("geom_type", T.StringType()),
    T.StructField("rings_xs", T.ArrayType(T.ArrayType(T.DoubleType()))),
    T.StructField("rings_ys", T.ArrayType(T.ArrayType(T.DoubleType()))),
])


def wkb_to_rings_udf() -> Column:
    """pandas UDF factory: binary WKB column -> (geom_type, rings_xs,
    rings_ys) struct, ready for pip_join's multi-ring path."""
    @F.pandas_udf(RINGS_STRUCT)
    def conv(b: pd.Series) -> pd.DataFrame:
        types, xss, yss = [], [], []
        for raw in b:
            g = decode(bytes(raw))
            xs, ys = to_rings(g)
            types.append(g["type"]); xss.append(xs); yss.append(ys)
        return pd.DataFrame({"geom_type": types, "rings_xs": xss,
                             "rings_ys": yss})
    return conv


def rings_to_wkb_udf(geom_type: str = "Polygon") -> Column:
    """pandas UDF factory: (rings_xs, rings_ys) -> WKB binary.

    ``geom_type='Polygon'``: all rings become one polygon (shell +
    holes); ``'MultiPolygon'``: each ring becomes a single-ring part.
    Rings are closed on write (WKB polygons require first == last).
    """
    @F.pandas_udf(T.BinaryType())
    def conv(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for rx_list, ry_list in zip(xs, ys):
            rings = []
            for rx, ry in zip(rx_list, ry_list):
                ring = [[float(x), float(y)] for x, y in zip(rx, ry)]
                if ring and ring[0] != ring[-1]:
                    ring.append(list(ring[0]))
                rings.append(ring)
            if geom_type == "Polygon":
                g = {"type": "Polygon", "coordinates": rings}
            else:
                g = {"type": "MultiPolygon",
                     "coordinates": [[r] for r in rings]}
            out.append(encode(g))
        return pd.Series(out)
    return conv


def read_wkb(df: DataFrame, wkb_col: str = "wkb") -> DataFrame:
    """Decode a WKB column into the engine's multi-ring layer shape:
    geom_type, rings_xs, rings_ys + envelope columns (JVM array math)."""
    out = df.withColumn("_g", wkb_to_rings_udf()(wkb_col))
    return (out.select(*[c for c in df.columns if c != wkb_col],
                       F.col("_g.geom_type").alias("geom_type"),
                       F.col("_g.rings_xs").alias("rings_xs"),
                       F.col("_g.rings_ys").alias("rings_ys"))
            .withColumn("xmin", F.array_min(F.expr(
                "transform(rings_xs, r -> array_min(r))")))
            .withColumn("ymin", F.array_min(F.expr(
                "transform(rings_ys, r -> array_min(r))")))
            .withColumn("xmax", F.array_max(F.expr(
                "transform(rings_xs, r -> array_max(r))")))
            .withColumn("ymax", F.array_max(F.expr(
                "transform(rings_ys, r -> array_max(r))"))))
