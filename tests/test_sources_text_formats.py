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
