"""S-57 (ENC) base-cell reader (`fiona/drvsupport.py:116-118`).

The fixture is authored here from the public specs (ISO/IEC 8211
record framing + the S-57 ed. 3.1 binary field layouts), independent
of the reader: raw struct packing of leaders, directories, and the
DSPM/VRID/SG2D/VRPT/FRID/ATTF/FSPT fields.
"""

import struct

import pytest

from fiona_spark.errors import DriverError
from fiona_spark.sources.s57 import listlayers_s57, read_s57

FT = b"\x1e"
UT = b"\x1f"


def rec8211(fields, leader_id="D"):
    """Build one ISO 8211 record: 24-byte leader + directory + fields."""
    area = b""
    entries = []
    for tag, payload in fields:
        fb = payload + FT
        entries.append((tag, len(fb), len(area)))
        area += fb
    len_w = max(len(str(max(l for _t, l, _p in entries))), 1)
    pos_w = max(len(str(max(p for _t, _l, p in entries))), 1)
    directory = b"".join(
        f"{t:<4}{l:0{len_w}d}{p:0{pos_w}d}".encode()
        for t, l, p in entries) + FT
    base = 24 + len(directory)
    rec_len = base + len(area)
    leader = (f"{rec_len:05d}" + "3" + leader_id + "E11" + "09"
              + f"{base:05d}" + " ! " + f"{len_w}{pos_w}0" + "4").encode()
    assert len(leader) == 24
    return leader + directory + area


def b11(v):
    return struct.pack("<B", v)


def b12(v):
    return struct.pack("<H", v)


def b14(v):
    return struct.pack("<I", v)


def b24(v):
    return struct.pack("<i", v)


def name(rcnm, rcid):
    return b11(rcnm) + b14(rcid)


def dspm(comf=10_000_000, somf=10):
    return (b11(20) + b14(1) + b11(2) + b11(7) + b11(23) + b14(52000)
            + b11(1) + b11(1) + b11(1) + b11(1) + b14(comf) + b14(somf))


def vrid(rcnm, rcid):
    return b11(rcnm) + b14(rcid) + b12(1) + b11(1)


def frid(rcid, prim, objl):
    return b11(100) + b14(rcid) + b11(prim) + b11(1) + b12(objl) \
        + b12(1) + b11(1)


def sg2d(*lonlat):
    out = b""
    for lon, lat in lonlat:
        out += b24(round(lat * 1e7)) + b24(round(lon * 1e7))  # Y first
    return out


def vrpt(*entries):
    out = b""
    for rcnm, rcid, topi in entries:
        out += name(rcnm, rcid) + b11(1) + b11(1) + b11(topi) + b11(255)
    return out


def fspt(*entries):
    out = b""
    for rcnm, rcid, ornt in entries:
        out += name(rcnm, rcid) + b11(ornt) + b11(1) + b11(255)
    return out


def attf(pairs):
    out = b""
    for attl, atvl in pairs.items():
        out += b12(attl) + atvl.encode("latin-1") + UT
    return out


@pytest.fixture(scope="module")
def cell(tmp_path_factory):
    d = tmp_path_factory.mktemp("s57")
    p = str(d / "GB4X0000.000")
    recs = [
        rec8211([("0000", b"stub ddr")], leader_id="L"),
        rec8211([("0001", b12(1)), ("DSPM", dspm())]),
        # isolated node VI 1 (a lighthouse position)
        rec8211([("0001", b12(2)), ("VRID", vrid(110, 1)),
                 ("SG2D", sg2d((12.3456789, -45.0000001)))]),
        # connected nodes VC 1 / VC 2 (edge endpoints)
        rec8211([("0001", b12(3)), ("VRID", vrid(120, 1)),
                 ("SG2D", sg2d((0.0, 0.0)))]),
        rec8211([("0001", b12(4)), ("VRID", vrid(120, 2)),
                 ("SG2D", sg2d((1.0, 1.0)))]),
        # edge VE 5: begin VC1, two interior vertices, end VC2
        rec8211([("0001", b12(5)), ("VRID", vrid(130, 5)),
                 ("VRPT", vrpt((120, 1, 1), (120, 2, 2))),
                 ("SG2D", sg2d((0.25, 0.5), (0.75, 0.5)))]),
        # point feature (OBJL 75 = LIGHTS) on VI 1, one attribute
        rec8211([("0001", b12(6)), ("FRID", frid(10, 1, 75)),
                 ("ATTF", attf({75: "6"})),
                 ("FSPT", fspt((110, 1, 1)))]),
        # line feature (OBJL 30 = COALNE) over edge VE 5, forward
        rec8211([("0001", b12(7)), ("FRID", frid(11, 2, 30)),
                 ("FSPT", fspt((130, 5, 1)))]),
        # area feature (OBJL 71 = LAKARE-ish) over the same edge, reversed
        rec8211([("0001", b12(8)), ("FRID", frid(12, 3, 71)),
                 ("FSPT", fspt((130, 5, 2)))]),
    ]
    with open(p, "wb") as fh:
        fh.writelines(recs)
    return p


def test_s57_point_feature(spark, cell):
    df = read_s57(spark, cell, layer="OBJL_75")
    r = df.collect()[0]
    assert r["geom_type"] == "Point" and r["prim"] == 1
    # COMF division is exact for these fixtures: round(v*1e7)/1e7
    assert r["xs"] == [123456789 / 1e7]
    assert r["ys"] == [-450000001 / 1e7]
    assert r["ATTL_75"] == "6"
    assert r["fid"] == 10 and r["objl"] == 75


def test_s57_line_feature_chains_edge_with_nodes(spark, cell):
    r = read_s57(spark, cell, layer="OBJL_30").collect()[0]
    assert r["geom_type"] == "LineString"
    assert r["xs"] == [0.0, 0.25, 0.75, 1.0]
    assert r["ys"] == [0.0, 0.5, 0.5, 1.0]


def test_s57_area_feature_reversed_and_closed(spark, cell):
    r = read_s57(spark, cell, layer="OBJL_71").collect()[0]
    assert r["geom_type"] == "Polygon"
    # ORNT=2 walks the edge end->begin, then the ring closes
    assert r["xs"] == [1.0, 0.75, 0.25, 0.0, 1.0]
    assert r["ys"] == [1.0, 0.5, 0.5, 0.0, 1.0]


def test_s57_all_features_and_layers(spark, cell):
    df = read_s57(spark, cell)
    assert df.count() == 3
    assert sorted(r["objl"] for r in df.collect()) == [30, 71, 75]
    assert listlayers_s57(cell) == ["OBJL_30", "OBJL_71", "OBJL_75"]
    # the attribute column exists on every row; null where absent
    assert df.filter("ATTL_75 IS NULL").count() == 2


def test_s57_registry_and_catalog(spark, cell):
    from fiona_spark.sources import catalog
    from fiona_spark.sources.drivers import (
        driver_from_extension, open_dataset, supported_drivers)
    assert supported_drivers()["s57"] == "r"
    assert driver_from_extension("/tmp/GB4X0000.000") == "s57"
    assert open_dataset(spark, cell, layer="OBJL_30").count() == 1
    assert catalog.listlayers(cell) == ["OBJL_30", "OBJL_71", "OBJL_75"]


def test_s57_errors(spark, cell, tmp_path):
    with pytest.raises(DriverError):
        read_s57(spark, cell, layer="OBJL_999")
    with pytest.raises(DriverError):
        read_s57(spark, cell, layer="lights")
    bad = tmp_path / "bad.000"
    bad.write_bytes(b"x" * 30)
    with pytest.raises(DriverError):
        read_s57(spark, str(bad))
