"""GML feature-collection source — reference parity for the GML driver
(`fiona/drvsupport.py` GML row; contract
`/root/reference/tests/test_curve_geometries.py::test_multicurve_conversion`:
curve members convert to linear approximations, RFC 49).

Stdlib ``xml.etree`` parse, namespace-agnostic (localname dispatch):
``featureMember``/``member`` elements become rows; the first child
element holding a GML geometry is the geometry property, every other
child with text becomes a property column.  Geometry subset:
Point/LineString/LinearRing (``pos``/``posList``),
Curve/segments/ArcString (arcs densified by the SAME kernel as the
WKB/WKT codecs), CompositeCurve (stitched), MultiCurve ->
MultiLineString, Polygon (exterior/interior), MultiSurface/
MultiPolygon -> MultiPolygon, MultiPoint.

Spark shape: XML has no record framing Spark can split on, so the
document parses on the driver (like TopoJSON); the resulting feature
list lands in one ``createDataFrame``.  Convert to parquet for bulk.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..errors import DriverError
from ..wkb import _linearize_arcs


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _pos_list(el) -> list:
    vals = [float(v) for v in (el.text or "").split()]
    return [[vals[i], vals[i + 1]] for i in range(0, len(vals) - 1, 2)]


def _line_of(el) -> list:
    """Any curve-ish element -> linear vertex list."""
    name = _local(el.tag)
    if name in ("LineString", "LinearRing"):
        for ch in el:
            if _local(ch.tag) == "posList":
                return _pos_list(ch)
            if _local(ch.tag) == "coordinates":
                return [[float(a) for a in pair.split(",")][:2]
                        for pair in (ch.text or "").split()]
        raise DriverError(f"{name} without posList")
    if name == "ArcString":
        for ch in el:
            if _local(ch.tag) == "posList":
                pts = np.asarray(_pos_list(ch), np.float64)
                return [list(map(float, q)) for q in _linearize_arcs(pts)]
        raise DriverError("ArcString without posList")
    if name == "Curve":
        pts: list = []
        for seg_holder in el:
            if _local(seg_holder.tag) != "segments":
                continue
            for seg in seg_holder:
                sub = (_line_of(seg) if _local(seg.tag) == "ArcString"
                       else _segment_line(seg))
                if pts and sub and pts[-1] == sub[0]:
                    sub = sub[1:]
                pts.extend(sub)
        return pts
    if name == "CompositeCurve":
        pts = []
        for member in el:
            if _local(member.tag) != "curveMember":
                continue
            for sub_el in member:
                sub = _line_of(sub_el)
                if pts and sub and pts[-1] == sub[0]:
                    sub = sub[1:]
                pts.extend(sub)
        return pts
    raise DriverError(f"unsupported curve element {name!r}")


def _segment_line(seg) -> list:
    """A gml:segments member that is not an ArcString: LineStringSegment
    with posList."""
    for ch in seg:
        if _local(ch.tag) == "posList":
            return _pos_list(ch)
    raise DriverError(f"unsupported segment {_local(seg.tag)!r}")


def _polygon_of(el) -> tuple[list, list]:
    rings = []
    for ch in el:
        role = _local(ch.tag)
        if role in ("exterior", "interior", "outerBoundaryIs",
                    "innerBoundaryIs"):
            for ring_el in ch:
                rings.append(_line_of(ring_el))
    return rings


_GEOM_TAGS = {"Point", "LineString", "Curve", "CompositeCurve",
              "MultiCurve", "Polygon", "Surface", "MultiSurface",
              "MultiPolygon", "MultiPoint", "MultiLineString"}


def decode_geometry(el) -> tuple[str, list, list]:
    """GML geometry element -> (geom_type, rings_xs, rings_ys)."""
    name = _local(el.tag)
    if name == "Point":
        for ch in el:
            if _local(ch.tag) in ("pos", "coordinates"):
                txt = (ch.text or "").replace(",", " ")
                x, y = [float(v) for v in txt.split()[:2]]
                return "Point", [[x]], [[y]]
        raise DriverError("Point without pos")
    if name in ("LineString", "Curve", "CompositeCurve"):
        pts = _line_of(el)
        return ("LineString", [[p[0] for p in pts]], [[p[1] for p in pts]])
    if name in ("MultiCurve", "MultiLineString"):
        parts = []
        for member in el:
            if _local(member.tag) in ("curveMember", "lineStringMember"):
                for sub in member:
                    parts.append(_line_of(sub))
        return ("MultiLineString",
                [[p[0] for p in part] for part in parts],
                [[p[1] for p in part] for part in parts])
    if name == "Polygon":
        rings = _polygon_of(el)
        return ("Polygon", [[p[0] for p in r] for r in rings],
                [[p[1] for p in r] for r in rings])
    if name in ("MultiSurface", "MultiPolygon"):
        rings = []
        for member in el:
            if _local(member.tag) in ("surfaceMember", "polygonMember"):
                for sub in member:
                    rings.extend(_polygon_of(sub))
        return ("MultiPolygon", [[p[0] for p in r] for r in rings],
                [[p[1] for p in r] for r in rings])
    if name == "MultiPoint":
        xs, ys = [], []
        for member in el:
            if _local(member.tag) == "pointMember":
                for sub in member:
                    _t, px, py = decode_geometry(sub)
                    xs.append(px[0][0]); ys.append(py[0][0])
        return "MultiPoint", [xs], [ys]
    raise DriverError(f"unsupported GML geometry {name!r}")


def _find_geometry(feature_el):
    """Depth-1/2 search for the geometry element inside a feature."""
    for ch in feature_el:
        if _local(ch.tag) in _GEOM_TAGS:
            return ch, None
        for sub in ch:
            if _local(sub.tag) in _GEOM_TAGS:
                return sub, ch
    return None, None


def read_gml(spark, path: str) -> DataFrame:
    """Open a GML FeatureCollection as a ring-model DataFrame."""
    root = ET.parse(path).getroot()
    rows = []
    for member in root:
        if _local(member.tag) not in ("featureMember", "member"):
            continue
        for feat in member:
            geom_el, geom_holder = _find_geometry(feat)
            if geom_el is None:
                t, rxs, rys = None, None, None
            else:
                t, rxs, rys = decode_geometry(geom_el)
            props = {}
            for ch in feat:
                if ch is geom_holder or _local(ch.tag) in _GEOM_TAGS \
                        or _local(ch.tag) == "boundedBy":
                    continue
                if ch.text and ch.text.strip():
                    props[_local(ch.tag)] = ch.text.strip()
            rows.append({"fid": len(rows), "geom_type": t,
                         "rings_xs": rxs, "rings_ys": rys, **props})
    if not rows:
        raise DriverError(f"no featureMember elements in {path!r}")
    df = spark.createDataFrame(pd.DataFrame(rows))
    return (df
            .withColumn("xs", F.expr("rings_xs[0]"))
            .withColumn("ys", F.expr("rings_ys[0]"))
            .withColumn("xmin", F.array_min(F.expr(
                "transform(rings_xs, r -> array_min(r))")))
            .withColumn("ymin", F.array_min(F.expr(
                "transform(rings_ys, r -> array_min(r))")))
            .withColumn("xmax", F.array_max(F.expr(
                "transform(rings_xs, r -> array_max(r))")))
            .withColumn("ymax", F.array_max(F.expr(
                "transform(rings_ys, r -> array_max(r))"))))
