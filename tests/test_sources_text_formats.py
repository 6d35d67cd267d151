"""r5 breadth drivers: ESRIJSON, BNA, OGR-GMT, ARCGEN, MapInfo
MIF/MID, OGR-SQLite, DXF — the remaining single-layer rows of the
reference's driver table (`fiona/drvsupport.py`), each implemented on
the published format spec (no GDAL) and round-tripped bit-exactly
where the format is writable (the engine-wide format-driver rule)."""

import json
import os
import sqlite3

import pytest

from fiona_spark.errors import DriverError


def _rings(df):
    """{fid: (geom_type, rings_xs, rings_ys)} for exact comparison."""
    return {r["fid"]: (r["geom_type"],
                       r["rings_xs"], r["rings_ys"])
            for r in df.collect()}


ZONES = [
    (0, "Polygon",
     [[-10.5, 20.25, 20.25, -10.5, -10.5]],
     [[-5.125, -5.125, 15.0625, 15.0625, -5.125]], "alpha", 2.5),
    (1, "Polygon",
     [[30.1, 40.9, 40.9, 30.1, 30.1],
      [33.3, 36.6, 36.6, 33.3, 33.3]],
     [[0.0, 0.0, 9.5, 9.5, 0.0],
      [2.2, 2.2, 7.7, 7.7, 2.2]], "beta|x", -0.75),
]
ZONES_SCHEMA = ("fid long, geom_type string, "
                "rings_xs array<array<double>>, "
                "rings_ys array<array<double>>, name string, val double")


@pytest.fixture()
def zones_df(spark):
    return spark.createDataFrame(ZONES, ZONES_SCHEMA)


# ---------------------------------------------------------------------------
# ESRIJSON (read-only, drvsupport ("ESRIJSON", "r"))
# ---------------------------------------------------------------------------

def test_esrijson_polygon_featureset(spark, tmp_path):
    from fiona_spark.sources.esrijson import read_esrijson
    doc = {
        "geometryType": "esriGeometryPolygon",
        "fields": [{"name": "NAME", "type": "esriFieldTypeString"},
                   {"name": "POP", "type": "esriFieldTypeInteger"}],
        "features": [
            {"attributes": {"NAME": "a", "POP": 10},
             "geometry": {"rings": [[[0.0, 0.0], [4.0, 0.0],
                                     [4.0, 4.0], [0.0, 0.0]]]}},
            {"attributes": {"NAME": "b", "POP": 20},
             "geometry": {"rings": [[[10.5, -2.25], [12.0, -2.25],
                                     [12.0, 1.0], [10.5, -2.25]],
                                    [[11.0, -1.0], [11.5, -1.0],
                                     [11.5, 0.0], [11.0, -1.0]]]}},
        ],
    }
    p = tmp_path / "fs.json"
    p.write_text(json.dumps(doc))
    df = read_esrijson(spark, str(p))
    rows = {r["NAME"]: r for r in df.collect()}
    assert rows["a"]["geom_type"] == "Polygon"
    assert rows["a"]["POP"] == 10
    assert rows["a"]["rings_xs"] == [[0.0, 4.0, 4.0, 0.0]]
    assert rows["b"]["rings_xs"] == [[10.5, 12.0, 12.0, 10.5],
                                     [11.0, 11.5, 11.5, 11.0]]
    assert rows["b"]["xmin"] == 10.5 and rows["b"]["ymax"] == 1.0


def test_esrijson_point_and_polyline(spark, tmp_path):
    from fiona_spark.sources.esrijson import read_esrijson
    pt = {"geometryType": "esriGeometryPoint",
          "features": [{"attributes": {"k": 1},
                        "geometry": {"x": 2.5, "y": -3.25}}]}
    pl = {"geometryType": "esriGeometryPolyline",
          "features": [{"attributes": {"k": 2},
                        "geometry": {"paths": [[[0.0, 0.0], [1.0, 1.0]],
                                               [[5.0, 5.0], [6.0, 7.0]]]}}]}
    p1, p2 = tmp_path / "pt.json", tmp_path / "pl.json"
    p1.write_text(json.dumps(pt)); p2.write_text(json.dumps(pl))
    r1 = read_esrijson(spark, str(p1)).collect()[0]
    assert (r1["geom_type"], r1["rings_xs"], r1["rings_ys"]) == \
        ("Point", [[2.5]], [[-3.25]])
    r2 = read_esrijson(spark, str(p2)).collect()[0]
    assert r2["geom_type"] == "MultiLineString"
    assert r2["rings_xs"] == [[0.0, 1.0], [5.0, 6.0]]


def test_esrijson_sniffs_geometry_type(spark, tmp_path):
    from fiona_spark.sources.esrijson import read_esrijson
    doc = {"features": [{"attributes": {},
                         "geometry": {"rings": [[[0.0, 0.0], [1.0, 0.0],
                                                 [1.0, 1.0],
                                                 [0.0, 0.0]]]}}]}
    p = tmp_path / "nogt.json"
    p.write_text(json.dumps(doc))
    assert read_esrijson(spark, str(p)).collect()[0]["geom_type"] \
        == "Polygon"


# ---------------------------------------------------------------------------
# BNA (rw, drvsupport ("BNA", "rw"))
# ---------------------------------------------------------------------------

def test_bna_round_trip_bit_exact(spark, tmp_path):
    from fiona_spark.sources.bna import read_bna, write_bna
    rows = [
        (0, "Point", [[2.5]], [[-3.0625]], "pt", "x"),
        (1, "LineString", [[0.1, 1.2, 2.3]], [[9.9, 8.8, 7.7]],
         "ln", "y"),
        (2, "Polygon", [[-10.5, 20.25, 20.25, -10.5, -10.5]],
         [[-5.125, -5.125, 15.0625, 15.0625, -5.125]], 'po"ly', "z"),
    ]
    df = spark.createDataFrame(
        rows, "fid long, geom_type string, "
              "rings_xs array<array<double>>, "
              "rings_ys array<array<double>>, id1 string, id2 string")
    p = str(tmp_path / "t.bna")
    write_bna(df, p)
    back = read_bna(spark, p)
    assert _rings(back) == {r[0]: (r[1], r[2], r[3]) for r in rows}
    got = {r["fid"]: (r["id1"], r["id2"]) for r in back.collect()}
    assert got == {0: ("pt", "x"), 1: ("ln", "y"), 2: ('po"ly', "z")}


def test_bna_ellipse_discretizes_like_gdal(spark, tmp_path):
    from fiona_spark.sources.bna import read_bna
    p = tmp_path / "e.bna"
    p.write_text('"c1","c2",2\n10.0,20.0\n2.0,1.0\n')
    r = read_bna(spark, str(p)).collect()[0]
    assert r["geom_type"] == "Polygon"
    assert len(r["rings_xs"][0]) == 361           # 360 + closure
    assert r["rings_xs"][0][0] == 12.0            # center + major radius
    assert abs(r["ymax"] - 21.0) < 1e-9


def test_bna_multiring_polygon_raises(spark, zones_df, tmp_path):
    from fiona_spark.sources.bna import write_bna
    with pytest.raises(DriverError, match="single-ring"):
        write_bna(zones_df, str(tmp_path / "m.bna"))


# ---------------------------------------------------------------------------
# OGR GMT (rw, drvsupport ("GMT", "rw") / ("OGR_GMT", "rw"))
# ---------------------------------------------------------------------------

def test_gmt_round_trip_bit_exact(spark, zones_df, tmp_path):
    from fiona_spark.sources.ogr_gmt import read_gmt, write_gmt
    p = str(tmp_path / "t.gmt")
    write_gmt(zones_df, p)
    back = read_gmt(spark, p)
    assert _rings(back) == {r[0]: (r[1], r[2], r[3]) for r in ZONES}
    got = {r["fid"]: (r["name"], r["val"]) for r in back.collect()}
    # the piped string survives because @D values are quoted on write
    assert got == {0: ("alpha", 2.5), 1: ("beta|x", -0.75)}


def test_gmt_header_declares_types(spark, zones_df, tmp_path):
    from fiona_spark.sources.ogr_gmt import write_gmt
    p = tmp_path / "t.gmt"
    write_gmt(zones_df, str(p))
    head = p.read_text().splitlines()[:4]
    assert head[0] == "# @VGMT1.0 @GPOLYGON"
    assert head[1] == "# @Nname|val"
    assert head[2] == "# @Tstring|double"


def test_gmt_points(spark, tmp_path):
    from fiona_spark.sources.ogr_gmt import read_gmt, write_gmt
    df = spark.createDataFrame(
        [(0, "Point", [[1.5]], [[2.5]], 7),
         (1, "Point", [[-3.25]], [[4.0]], 8)],
        "fid long, geom_type string, rings_xs array<array<double>>, "
        "rings_ys array<array<double>>, k long")
    p = str(tmp_path / "p.gmt")
    write_gmt(df, p)
    back = read_gmt(spark, p).orderBy("fid").collect()
    assert [r["geom_type"] for r in back] == ["Point", "Point"]
    assert [r["k"] for r in back] == [7, 8]
    assert back[1]["rings_xs"] == [[-3.25]]


# ---------------------------------------------------------------------------
# ARCGEN (read-only, drvsupport ("ARCGEN", "r"))
# ---------------------------------------------------------------------------

def test_arcgen_points(spark, tmp_path):
    from fiona_spark.sources.arcgen import read_arcgen
    p = tmp_path / "p.gen"
    p.write_text("1,2.5,3.5\n2,-4.25,6.0\nEND\n")
    back = read_arcgen(spark, str(p)).orderBy("fid").collect()
    assert [(r["fid"], r["geom_type"], r["rings_xs"][0][0])
            for r in back] == [(1, "Point", 2.5), (2, "Point", -4.25)]


def test_arcgen_lines_and_polygons(spark, tmp_path):
    from fiona_spark.sources.arcgen import read_arcgen
    p = tmp_path / "l.gen"
    p.write_text(
        "7\n0.0,0.0\n5.0,0.0\n5.0,5.0\nEND\n"
        "8\n10.0,10.0\n12.0,10.0\n12.0,12.0\n10.0,10.0\nEND\n"
        "END\n")
    back = {r["fid"]: r for r in read_arcgen(spark, str(p)).collect()}
    assert back[7]["geom_type"] == "LineString"
    assert back[8]["geom_type"] == "Polygon"       # closed chain
    assert back[8]["rings_xs"] == [[10.0, 12.0, 12.0, 10.0]]


# ---------------------------------------------------------------------------
# MapInfo MIF/MID (raw, drvsupport ("MapInfo File", "raw"))
# ---------------------------------------------------------------------------

def test_mapinfo_round_trip_bit_exact(spark, tmp_path):
    from fiona_spark.sources.mapinfo import read_mapinfo, write_mapinfo
    rows = [
        (0, "Point", [[2.5]], [[-3.0625]], "a,b", 1, 0.5, True),
        (1, "LineString", [[0.1, 1.2, 2.3]], [[9.9, 8.8, 7.7]],
         None, 2, None, False),
        (2, "MultiLineString", [[0.0, 1.0], [5.0, 6.5]],
         [[0.0, 1.0], [5.0, 6.5]], "c", 3, -1.25, None),
        (3, "Polygon",
         [[30.1, 40.9, 40.9, 30.1, 30.1],
          [33.3, 36.6, 36.6, 33.3, 33.3]],
         [[0.0, 0.0, 9.5, 9.5, 0.0],
          [2.2, 2.2, 7.7, 7.7, 2.2]], 'q"t', 4, 2.0, True),
        (4, None, None, None, "none", 5, 0.0, False),
    ]
    df = spark.createDataFrame(
        rows, "fid long, geom_type string, "
              "rings_xs array<array<double>>, "
              "rings_ys array<array<double>>, "
              "name string, n long, v double, flag boolean")
    p = str(tmp_path / "t.mif")
    write_mapinfo(df, p)
    back = read_mapinfo(spark, p)
    assert _rings(back) == {r[0]: (r[1], r[2], r[3]) for r in rows}
    got = {r["fid"]: (r["name"], r["n"], r["v"], r["flag"])
           for r in back.collect()}
    assert got == {r[0]: (r[4], r[5], r[6], r[7]) for r in rows}


def test_mapinfo_append(spark, tmp_path):
    from fiona_spark.sources.mapinfo import read_mapinfo, write_mapinfo
    schema = ("fid long, geom_type string, "
              "rings_xs array<array<double>>, "
              "rings_ys array<array<double>>, name string")
    a = spark.createDataFrame(
        [(0, "Point", [[1.0]], [[2.0]], "one")], schema)
    b = spark.createDataFrame(
        [(1, "Point", [[3.0]], [[4.0]], "two")], schema)
    p = str(tmp_path / "ap.mif")
    write_mapinfo(a, p)
    write_mapinfo(b, p, mode="a")
    back = read_mapinfo(spark, p).orderBy("fid").collect()
    assert [(r["name"], r["rings_xs"][0][0]) for r in back] == \
        [("one", 1.0), ("two", 3.0)]


def test_mapinfo_append_schema_mismatch_raises(spark, tmp_path):
    from fiona_spark.sources.mapinfo import write_mapinfo
    schema = ("fid long, geom_type string, "
              "rings_xs array<array<double>>, "
              "rings_ys array<array<double>>, name string")
    a = spark.createDataFrame([(0, "Point", [[1.0]], [[2.0]], "x")],
                              schema)
    p = str(tmp_path / "m.mif")
    write_mapinfo(a, p)
    bad = a.withColumnRenamed("name", "other")
    with pytest.raises(DriverError, match="schema mismatch"):
        write_mapinfo(bad, p, mode="a")


# ---------------------------------------------------------------------------
# OGR SQLite (raw, drvsupport ("SQLite", "raw"))
# ---------------------------------------------------------------------------

def test_sqlite_round_trip_bit_exact(spark, zones_df, tmp_path):
    from fiona_spark.sources.sqlite_db import (
        listlayers_sqlite, read_sqlite, write_sqlite)
    p = str(tmp_path / "t.sqlite")
    write_sqlite(zones_df, p, layer="zones")
    assert listlayers_sqlite(p) == ["zones"]
    back = read_sqlite(spark, p, "zones")
    got = {r["name"]: (r["geom_type"], r["rings_xs"], r["rings_ys"],
                       r["val"]) for r in back.collect()}
    assert got == {r[4]: (r[1], r[2], r[3], r[5]) for r in ZONES}
    # OGR layout on disk: geometry_columns registry + WKB format tag
    with sqlite3.connect(p) as con:
        reg = con.execute("SELECT f_table_name, f_geometry_column, "
                          "geometry_type, geometry_format FROM "
                          "geometry_columns").fetchone()
    assert reg == ("zones", "GEOMETRY", 3, "WKB")


def test_sqlite_append_and_null_geometry(spark, tmp_path):
    from fiona_spark.sources.sqlite_db import read_sqlite, write_sqlite
    schema = ("geom_type string, rings_xs array<array<double>>, "
              "rings_ys array<array<double>>, k long")
    a = spark.createDataFrame(
        [("Point", [[1.0]], [[2.0]], 1), (None, None, None, 2)], schema)
    b = spark.createDataFrame([("Point", [[9.0]], [[9.0]], 3)], schema)
    p = str(tmp_path / "ap.sqlite")
    write_sqlite(a, p, layer="pts")
    write_sqlite(b, p, layer="pts", mode="a")
    back = {r["k"]: r for r in read_sqlite(spark, p, "pts").collect()}
    assert sorted(back) == [1, 2, 3]
    assert back[2]["geom_type"] is None
    assert back[3]["rings_xs"] == [[9.0]]
    with pytest.raises(DriverError, match="does not exist"):
        write_sqlite(b, p, layer="nope", mode="a")


# ---------------------------------------------------------------------------
# DXF (rw, drvsupport ("DXF", "rw"))
# ---------------------------------------------------------------------------

def test_dxf_round_trip_bit_exact(spark, tmp_path):
    from fiona_spark.sources.dxf import read_dxf, write_dxf
    rows = [
        (0, "Point", [[2.5]], [[-3.0625]], "roads"),
        (1, "LineString", [[0.1, 1.2, 2.3]], [[9.9, 8.8, 7.7]],
         "roads"),
        (2, "Polygon", [[-10.5, 20.25, 20.25, -10.5, -10.5]],
         [[-5.125, -5.125, 15.0625, 15.0625, -5.125]], "parcels"),
    ]
    df = spark.createDataFrame(
        rows, "fid long, geom_type string, "
              "rings_xs array<array<double>>, "
              "rings_ys array<array<double>>, layer string")
    p = str(tmp_path / "t.dxf")
    write_dxf(df, p)
    back = read_dxf(spark, p)
    assert _rings(back) == {r[0]: (r[1], r[2], r[3]) for r in rows}
    got = {r["fid"]: (r["layer"], r["entity"]) for r in back.collect()}
    assert got == {0: ("roads", "POINT"), 1: ("roads", "LWPOLYLINE"),
                   2: ("parcels", "LWPOLYLINE")}


def test_dxf_polyline_vertex_seqend(spark, tmp_path):
    from fiona_spark.sources.dxf import read_dxf
    doc = ("0\nSECTION\n2\nENTITIES\n"
           "0\nPOLYLINE\n8\nL1\n70\n1\n"
           "0\nVERTEX\n10\n0.0\n20\n0.0\n"
           "0\nVERTEX\n10\n3.0\n20\n0.0\n"
           "0\nVERTEX\n10\n3.0\n20\n3.0\n"
           "0\nSEQEND\n"
           "0\nENDSEC\n0\nEOF\n")
    p = tmp_path / "p.dxf"
    p.write_text(doc)
    r = read_dxf(spark, str(p)).collect()[0]
    assert r["geom_type"] == "Polygon"            # closed flag
    assert r["rings_xs"] == [[0.0, 3.0, 3.0, 0.0]]  # closure added
    assert r["layer"] == "L1"


# ---------------------------------------------------------------------------
# registry integration
# ---------------------------------------------------------------------------

def test_registry_modes_and_extensions():
    from fiona_spark.sources.drivers import (
        check_mode, driver_from_extension, supported_drivers)
    sup = supported_drivers()
    assert sup["esrijson"] == "r" and sup["arcgen"] == "r"
    assert sup["bna"] == "rw" and sup["gmt"] == "rw"
    assert sup["dxf"] == "rw"
    assert sup["mapinfo"] == "raw" and sup["sqlite"] == "raw"
    for ext, drv in ((".bna", "bna"), (".gmt", "gmt"),
                     (".gen", "arcgen"), (".mif", "mapinfo"),
                     (".sqlite", "sqlite"), (".dxf", "dxf")):
        assert driver_from_extension(f"/tmp/x{ext}") == drv
    with pytest.raises(DriverError):
        check_mode("esrijson", "w")
    with pytest.raises(DriverError):
        check_mode("dxf", "a")


def test_open_dataset_infers_new_drivers(spark, tmp_path):
    from fiona_spark.sources.drivers import open_dataset
    p = tmp_path / "i.bna"
    p.write_text('"n","",1\n5.5,6.5\n')
    r = open_dataset(spark, str(p)).collect()[0]
    assert (r["geom_type"], r["rings_xs"]) == ("Point", [[5.5]])


# ---------------------------------------------------------------------------
# DGN v7 (r6, ISFF spec) — fixture bytes authored INDEPENDENTLY here
# ---------------------------------------------------------------------------

def _dgn_word_bytes(v32):
    """int32 -> PDP-11 middle-endian bytes (high LE word first)."""
    v = v32 & 0xFFFFFFFF
    hi, lo = (v >> 16) & 0xFFFF, v & 0xFFFF
    return bytes([hi & 0xFF, hi >> 8, lo & 0xFF, lo >> 8])


def _dgn_double_bytes(x):
    import struct
    bits = struct.unpack("<Q", struct.pack("<d", x))[0]
    out = b""
    for shift in (48, 32, 16, 0):
        w = (bits >> shift) & 0xFFFF
        out += bytes([w & 0xFF, w >> 8])
    return out


def _dgn_element(etype, level, payload, deleted=False, complex_=False):
    words = len(payload) // 2
    b0 = (level & 0x3F) | (0x80 if deleted else 0)
    b1 = (etype & 0x7F) | (0x80 if complex_ else 0)
    return bytes([b0, b1, words & 0xFF, words >> 8]) + payload


def _dgn_display_header(gg=0, style=0, weight=0, color=0):
    # 24-byte range block (ignored by the reader) + gg + attr index +
    # properties + symbology byte pair
    out = b"\x00" * 24
    out += bytes([gg & 0xFF, gg >> 8])          # graphic group
    out += b"\x00\x00"                          # attribute index
    out += b"\x00\x00"                          # properties
    out += bytes([(style & 0x07) | ((weight & 0x1F) << 3), color])
    return out


def _build_dgn(tmp_path, uor_per_master=1000, origin=(0.0, 0.0)):
    """A tiny 2D design file: TCB + line + shape + text + deleted elem."""
    # TCB: 1252 bytes of payload; fields at the documented offsets
    tcb = bytearray(1252)
    body_off = 4   # offsets in the module are body-relative incl. header
    def put(off, data):
        tcb[off - body_off:off - body_off + len(data)] = data
    put(1112, _dgn_word_bytes(10))             # sub per master
    put(1116, _dgn_word_bytes(uor_per_master // 10))  # uor per sub
    put(1240, _dgn_double_bytes(origin[0]))
    put(1248, _dgn_double_bytes(origin[1]))
    els = [_dgn_element(9, 0, bytes(tcb))]
    dh = _dgn_display_header(gg=7, style=2, weight=3, color=4)
    # LINE (3): 2 vertices at offsets 36..51
    line = dh + b"".join(_dgn_word_bytes(v) for v in
                         (1000, 2000, 3000, 4000))
    els.append(_dgn_element(3, 5, line))
    # SHAPE (6): closed triangle, numverts u16 then pairs
    verts = [(0, 0), (4000, 0), (0, 4000), (0, 0)]
    shp = dh + bytes([len(verts), 0]) + b"".join(
        _dgn_word_bytes(c) for xy in verts for c in xy)
    els.append(_dgn_element(6, 2, shp))
    # deleted element must be skipped
    els.append(_dgn_element(3, 1, line, deleted=True))
    # TEXT (17): font/just + mults + rotation + origin + nchars + chars
    txt = bytearray(dh)
    txt += bytes([3, 0])                        # font, justification
    txt += _dgn_word_bytes(0) + _dgn_word_bytes(0)   # length/height mult
    txt += _dgn_word_bytes(0)                   # rotation
    txt += _dgn_word_bytes(5500) + _dgn_word_bytes(6500)  # origin
    label = b"HELLO"
    txt += bytes([len(label), 0]) + label
    if len(txt) % 2:
        txt += b"\x00"
    els.append(_dgn_element(17, 9, bytes(txt)))
    els.append(bytes([0xFF, 0x00, 0x00, 0x00]))  # type-0 EOF marker? no:
    # proper EOF: type 0 + words 0 header
    p = tmp_path / "design.dgn"
    p.write_bytes(b"".join(els[:-1]) + bytes([0x00, 0x00, 0x00, 0x00]))
    return str(p)


def test_dgn_elements_decode_with_tcb_scaling(spark, tmp_path):
    from fiona_spark.sources.dgn import read_dgn
    path = _build_dgn(tmp_path, uor_per_master=1000)
    rows = read_dgn(spark, path).orderBy("fid").collect()
    assert [r["Type"] for r in rows] == [3, 6, 17]
    line = rows[0]
    assert line["geom_type"] == "LineString" and line["Level"] == 5
    assert line["GraphicGroup"] == 7 and line["Style"] == 2
    assert line["Weight"] == 3 and line["ColorIndex"] == 4
    # UOR 1000 / (10 sub/master * 100 uor/sub) = 1.0 master unit
    assert line["xs"] == [1.0, 3.0] and line["ys"] == [2.0, 4.0]
    shape = rows[1]
    assert shape["geom_type"] == "Polygon"
    assert shape["xs"] == [0.0, 4.0, 0.0, 0.0]
    text = rows[2]
    assert text["geom_type"] == "Point" and text["Text"] == "HELLO"
    assert text["xs"] == [5.5] and text["ys"] == [6.5]


def test_dgn_global_origin_and_registry(spark, tmp_path):
    from fiona_spark.sources.drivers import open_dataset
    path = _build_dgn(tmp_path, uor_per_master=1000,
                      origin=(-2000.0, 1000.0))
    rows = open_dataset(spark, path).orderBy("fid").collect()
    line = rows[0]
    assert line["xs"] == [(1000.0 + 2000.0) / 1000.0,
                          (3000.0 + 2000.0) / 1000.0]
    assert line["ys"] == [(2000.0 - 1000.0) / 1000.0,
                          (4000.0 - 1000.0) / 1000.0]


def test_dgn_write_is_rejected(spark, tmp_path):
    from fiona_spark.errors import DriverError
    from fiona_spark.sources import drivers
    df = spark.range(1)
    with pytest.raises(DriverError):
        drivers.write_dataset(df, str(tmp_path / "x.dgn"), "dgn")


# ---------------------------------------------------------------------------
# PDS3 tables (r6, ODL label spec) — fixtures authored from the spec
# ---------------------------------------------------------------------------

_PDS_LABEL = """\
PDS_VERSION_ID          = PDS3
RECORD_TYPE             = FIXED_LENGTH
RECORD_BYTES            = 40
FILE_RECORDS            = 3
^TABLE                  = "CRATERS.TAB"
OBJECT                  = TABLE
  INTERCHANGE_FORMAT    = ASCII
  ROWS                  = 3
  ROW_BYTES             = 40
  COLUMNS               = 4
  OBJECT                = COLUMN
    NAME                = CRATER_ID
    DATA_TYPE           = CHARACTER
    START_BYTE          = 1
    BYTES               = 8
  END_OBJECT            = COLUMN
  OBJECT                = COLUMN
    NAME                = DIAMETER
    DATA_TYPE           = ASCII_REAL
    START_BYTE          = 10
    BYTES               = 8
  END_OBJECT            = COLUMN
  OBJECT                = COLUMN
    NAME                = LATITUDE
    DATA_TYPE           = ASCII_REAL
    START_BYTE          = 19
    BYTES               = 9
  END_OBJECT            = COLUMN
  OBJECT                = COLUMN
    NAME                = LONGITUDE
    DATA_TYPE           = ASCII_REAL
    START_BYTE          = 29
    BYTES               = 10
  END_OBJECT            = COLUMN
END_OBJECT              = TABLE
END
"""


def _pds_ascii_fixture(tmp_path):
    lbl = tmp_path / "craters.lbl"
    lbl.write_text(_PDS_LABEL)
    recs = [
        ("COP-1   ", "  93.000", "   -9.620", "   -61.400"),
        ("TYCHO   ", "  85.000", "  -43.310", "   -11.360"),
        ("KEPLER  ", "  32.000", "    8.120", "   -38.010"),
    ]
    body = "".join(f"{a} {b} {c} {d} \r\n".ljust(40)[:40]
                   for a, b, c, d in recs)
    (tmp_path / "CRATERS.TAB").write_text(body)
    return str(lbl)


def test_pds_ascii_table_points(spark, tmp_path):
    from fiona_spark.sources.pds import read_pds
    path = _pds_ascii_fixture(tmp_path)
    rows = read_pds(spark, path).collect()
    assert [r["CRATER_ID"] for r in rows] == ["COP-1", "TYCHO", "KEPLER"]
    assert [r["DIAMETER"] for r in rows] == [93.0, 85.0, 32.0]
    r0 = rows[0]
    assert r0["geom_type"] == "Point"
    assert r0["xs"] == [-61.4] and r0["ys"] == [-9.62]
    assert r0["xmin"] == -61.4 and r0["ymax"] == -9.62


def test_pds_registry_and_modes(spark, tmp_path):
    from fiona_spark.errors import DriverError
    from fiona_spark.sources import drivers
    path = _pds_ascii_fixture(tmp_path)
    assert drivers.open_dataset(spark, path).count() == 3
    with pytest.raises(DriverError):
        drivers.write_dataset(spark.range(1), str(tmp_path / "o.lbl"),
                              "pds")


def test_pds_binary_attached_table(spark, tmp_path):
    """Attached BINARY product: label + data in ONE file, ^TABLE by
    record number, MSB ints + IEEE reals + CHARACTER."""
    import struct as st
    rows = [(1, 2.5, b"AB"), (2, -0.25, b"CD")]
    body = b"".join(st.pack(">i", i) + st.pack(">d", v) + s
                    for i, v, s in rows)
    label = (
        "PDS_VERSION_ID = PDS3\r\n"
        "RECORD_TYPE = FIXED_LENGTH\r\n"
        "RECORD_BYTES = 64\r\n"
        "^TABLE = 17\r\n"
        "OBJECT = TABLE\r\n"
        "  INTERCHANGE_FORMAT = BINARY\r\n"
        "  ROWS = 2\r\n"
        "  ROW_BYTES = 14\r\n"
        "  OBJECT = COLUMN\r\n"
        "    NAME = SEQ\r\n"
        "    DATA_TYPE = MSB_INTEGER\r\n"
        "    START_BYTE = 1\r\n"
        "    BYTES = 4\r\n"
        "  END_OBJECT = COLUMN\r\n"
        "  OBJECT = COLUMN\r\n"
        "    NAME = VAL\r\n"
        "    DATA_TYPE = IEEE_REAL\r\n"
        "    START_BYTE = 5\r\n"
        "    BYTES = 8\r\n"
        "  END_OBJECT = COLUMN\r\n"
        "  OBJECT = COLUMN\r\n"
        "    NAME = TAG\r\n"
        "    DATA_TYPE = CHARACTER\r\n"
        "    START_BYTE = 13\r\n"
        "    BYTES = 2\r\n"
        "  END_OBJECT = COLUMN\r\n"
        "END_OBJECT = TABLE\r\n"
        "END\r\n")
    blob = label.encode("ascii").ljust(16 * 64, b" ") + body
    p = tmp_path / "attached.lbl"
    p.write_bytes(blob)
    from fiona_spark.sources.pds import read_pds
    got = read_pds(spark, str(p)).orderBy("SEQ").collect()
    assert [r["SEQ"] for r in got] == [1, 2]
    assert [r["VAL"] for r in got] == [2.5, -0.25]
    assert [r["TAG"] for r in got] == ["AB", "CD"]
    assert "geom_type" not in got[0].asDict()   # no lon/lat columns


def test_pds_byte_pointer_forms(spark, tmp_path):
    """^TABLE byte pointers are 1-BASED (spec: '^TABLE = 601 <BYTES>'
    puts the object AT byte 601 = file offset 600; GDAL subtracts 1):
    both the attached 'n <BYTES>' and detached '("F.TAB", n <BYTES>)'
    forms must not read one byte late."""
    import struct as st
    from fiona_spark.sources.pds import read_pds
    body = st.pack(">i", 7) + st.pack(">d", 1.5)
    col_odl = (
        "OBJECT = TABLE\r\n"
        "  INTERCHANGE_FORMAT = BINARY\r\n"
        "  ROWS = 1\r\n"
        "  ROW_BYTES = 12\r\n"
        "  OBJECT = COLUMN\r\n"
        "    NAME = SEQ\r\n"
        "    DATA_TYPE = MSB_INTEGER\r\n"
        "    START_BYTE = 1\r\n"
        "    BYTES = 4\r\n"
        "  END_OBJECT = COLUMN\r\n"
        "  OBJECT = COLUMN\r\n"
        "    NAME = VAL\r\n"
        "    DATA_TYPE = IEEE_REAL\r\n"
        "    START_BYTE = 5\r\n"
        "    BYTES = 8\r\n"
        "  END_OBJECT = COLUMN\r\n"
        "END_OBJECT = TABLE\r\n"
        "END\r\n")
    # attached form: data starts AT byte 601 -> offset 600
    label = ("PDS_VERSION_ID = PDS3\r\n"
             "RECORD_TYPE = FIXED_LENGTH\r\n"
             "^TABLE = 601 <BYTES>\r\n" + col_odl)
    p = tmp_path / "bytes_attached.lbl"
    p.write_bytes(label.encode("ascii").ljust(600, b" ") + body)
    got = read_pds(spark, str(p)).collect()
    assert got[0]["SEQ"] == 7 and got[0]["VAL"] == 1.5
    # detached form: ("F.TAB", 101 <BYTES>) -> offset 100 in F.TAB
    label2 = ("PDS_VERSION_ID = PDS3\r\n"
              "RECORD_TYPE = FIXED_LENGTH\r\n"
              '^TABLE = ("PTR.TAB", 101 <BYTES>)\r\n' + col_odl)
    (tmp_path / "bytes_detached.lbl").write_text(label2)
    (tmp_path / "PTR.TAB").write_bytes(b"\xff" * 100 + body)
    got2 = read_pds(spark, str(tmp_path / "bytes_detached.lbl")).collect()
    assert got2[0]["SEQ"] == 7 and got2[0]["VAL"] == 1.5


# ---------------------------------------------------------------------------
# SUA airspace (r6) — text fixture authored from the format description
# ---------------------------------------------------------------------------

_SUA_TEXT = """\
# demo airspace file
TYPE=DANGER
TITLE=D123 TEST RANGE
CLASS=D
TOPS=5000 FT
BASE=SFC
POINT=5530.0N 00230.0W
POINT=5530.0N 00200.0W
POINT=5500.0N 00200.0W
POINT=5500.0N 00230.0W
END

TYPE=PROHIBITED
TITLE=P1 CIRCLE ZONE
TOPS=2000 FT
BASE=SFC
CIRCLE RADIUS=3 CENTRE=5520.0N 00215.0W
END
"""


def test_sua_blocks_and_coordinates(spark, tmp_path):
    from fiona_spark.sources.sua import read_sua
    p = tmp_path / "demo.sua"
    p.write_text(_SUA_TEXT)
    rows = read_sua(spark, str(p)).orderBy("fid").collect()
    assert [r["TYPE"] for r in rows] == ["DANGER", "PROHIBITED"]
    d = rows[0]
    assert d["TITLE"] == "D123 TEST RANGE" and d["CLASS"] == "D"
    assert d["TOPS"] == "5000 FT" and d["BASE"] == "SFC"
    assert d["geom_type"] == "Polygon"
    # 5530.0N = 55.5, 00230.0W = -2.5; ring closed
    assert d["xs"][0] == -2.5 and d["ys"][0] == 55.5
    assert d["xs"][-1] == d["xs"][0] and d["ys"][-1] == d["ys"][0]
    assert len(d["xs"]) == 5
    c = rows[1]
    assert c["geom_type"] == "Polygon" and len(c["xs"]) == 361
    # circle: radius 3 NM = 0.05 deg of LATITUDE around (-2.25, 55.33..);
    # the longitude offset is scaled by 1/cos(lat) (ground circle, GDAL
    # SUA convention), so measure in the locally-isotropic frame.
    import math
    cx, cy = -2.25, 55.0 + 20.0 / 60.0
    k = math.cos(math.radians(cy))
    for x, y in zip(c["xs"][:10], c["ys"][:10]):
        assert abs(math.hypot((x - cx) * k, y - cy) - 0.05) < 1e-9
    # and it really is wider in raw longitude degrees than in latitude
    assert (max(c["xs"]) - min(c["xs"])) > (max(c["ys"]) - min(c["ys"])) * 1.5


def test_sua_arc_linearization(spark, tmp_path):
    from fiona_spark.sources.sua import read_sua
    p = tmp_path / "arc.sua"
    # quarter arc, clockwise about the origin from (1,0)-ish points:
    # decimal fallback coordinates 'lat lon'
    p.write_text(
        "TYPE=DANGER\nTITLE=ARC\n"
        "POINT=0.0 1.0\n"
        "CLOCKWISE RADIUS=60 CENTRE=0.0 0.0 TO=-1.0 0.0\n"
        "POINT=0.0 0.0\n"
        "END\n")
    r = read_sua(spark, str(p)).collect()[0]
    import math
    # every arc point sits on the unit circle (radius 60 NM = 1 deg)
    arc = list(zip(r["xs"], r["ys"]))[1:-2]
    assert all(abs(math.hypot(x, y) - 1.0) < 1e-9 for x, y in arc)
    # clockwise from (1,0): first arc points have NEGATIVE y
    assert arc[0][1] < 0
    assert abs(arc[-1][0]) < 1e-9 and abs(arc[-1][1] + 1.0) < 1e-9


def test_sua_registry_read_only(spark, tmp_path):
    from fiona_spark.errors import DriverError
    from fiona_spark.sources import drivers
    p = tmp_path / "demo.sua"
    p.write_text(_SUA_TEXT)
    assert drivers.open_dataset(spark, str(p)).count() == 2
    with pytest.raises(DriverError):
        drivers.write_dataset(spark.range(1), str(tmp_path / "o.sua"),
                              "sua")


# ---------------------------------------------------------------------------
# SEG-Y (r6) — binary fixture authored from the rev1 standard
# ---------------------------------------------------------------------------

def _build_segy(tmp_path, fmt=5):
    import struct as st
    text_hdr = ("C 1 ENGINE TEST LINE".ljust(3200)).encode("cp500")
    bin_hdr = bytearray(400)
    bin_hdr[16:18] = st.pack(">H", 2000)       # sample interval (us)
    bin_hdr[20:22] = st.pack(">H", 4)          # samples per trace
    bin_hdr[24:26] = st.pack(">H", fmt)        # data format code
    traces = b""
    data = [[1.5, -2.25, 0.0, 4.0], [0.5, 0.25, -1.0, 2.0]]
    coords = [(312345, 5012345), (312400, 5012400)]
    for i, (samples, (sx, sy)) in enumerate(zip(data, coords), 1):
        th = bytearray(240)
        th[0:4] = st.pack(">i", i)             # trace sequence number
        th[20:24] = st.pack(">i", 100 + i)     # ensemble number
        th[70:72] = st.pack(">h", -100)        # scalar: divide by 100
        th[72:76] = st.pack(">i", sx)
        th[76:80] = st.pack(">i", sy)
        th[114:116] = st.pack(">H", len(samples))
        th[116:118] = st.pack(">H", 2000)
        if fmt == 5:
            payload = b"".join(st.pack(">f", v) for v in samples)
        elif fmt == 3:
            payload = b"".join(st.pack(">h", int(v)) for v in samples)
        else:
            raise AssertionError
        traces += bytes(th) + payload
    p = tmp_path / "line.sgy"
    p.write_bytes(text_hdr + bytes(bin_hdr) + traces)
    return str(p)


def test_segy_traces_decode(spark, tmp_path):
    from fiona_spark.sources.segy import read_segy
    path = _build_segy(tmp_path, fmt=5)
    rows = read_segy(spark, path).orderBy("fid").collect()
    assert [r["TRACE_NUMBER"] for r in rows] == [1, 2]
    assert [r["ENSEMBLE_NUMBER"] for r in rows] == [101, 102]
    r0 = rows[0]
    assert r0["SAMPLES"] == [1.5, -2.25, 0.0, 4.0]
    assert r0["SAMPLES_COUNT"] == 4 and r0["SAMPLE_INTERVAL"] == 2000
    # scalar -100 divides: point at (3123.45, 50123.45)
    assert r0["geom_type"] == "Point"
    assert r0["xs"] == [3123.45] and r0["ys"] == [50123.45]


def test_segy_ibm_float_decode():
    import numpy as np
    from fiona_spark.sources.segy import _ibm_to_float
    # published IBM float examples: 0x42640000 = 100.0,
    # 0xC2640000 = -100.0, 0x41100000 = 1.0
    raw = np.array([0x42640000, 0xC2640000, 0x41100000, 0x00000000],
                   dtype=np.uint32)
    got = _ibm_to_float(raw)
    assert got.tolist() == [100.0, -100.0, 1.0, 0.0]


def test_segy_registry_and_int16_format(spark, tmp_path):
    from fiona_spark.sources import drivers
    path = _build_segy(tmp_path, fmt=3)
    rows = drivers.open_dataset(spark, path).orderBy("fid").collect()
    assert rows[0]["SAMPLES"] == [1.0, -2.0, 0.0, 4.0]
