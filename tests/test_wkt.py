"""WKT codec: round-trips, curve linearization (cross-checked against
the WKB codec on identical arcs), and the reference's curves_line.csv
contract (tests/test_curve_geometries.py: 9 features, curves
converted to linear approximations)."""

import csv
import os

import numpy as np
import pytest

from fiona_spark import wkb, wkt

RT_CASES = [
    {"type": "Point", "coordinates": [1.5, -2.25]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [3.0, 4.0]]},
    {"type": "Polygon", "coordinates": [
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
        [[1.0, 1.0], [2.0, 1.0], [1.0, 2.0], [1.0, 1.0]]]},
    {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    {"type": "MultiLineString", "coordinates": [
        [[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 0.0]]],
        [[[5.0, 5.0], [7.0, 5.0], [7.0, 7.0], [5.0, 5.0]]]]},
]


def test_wkt_roundtrip_geojson_types():
    for g in RT_CASES:
        assert wkt.decode(wkt.encode(g)) == g


def test_wkt_dims_and_multipoint_forms():
    g = wkt.decode("POINT Z (1 2 3)")
    assert g["coordinates"] == [1.0, 2.0, 3.0]
    g = wkt.decode("POINT M (1 2 9)")          # M dropped
    assert g["coordinates"] == [1.0, 2.0]
    g = wkt.decode("POINT ZM (1 2 3 9)")       # Z kept, M dropped
    assert g["coordinates"] == [1.0, 2.0, 3.0]
    a = wkt.decode("MULTIPOINT ((1 2), (3 4))")
    b = wkt.decode("MULTIPOINT (1 2, 3 4)")
    assert a == b
    assert wkt.decode("LINESTRING EMPTY")["coordinates"] == []


def test_wkt_curves_match_wkb_linearization():
    """CIRCULARSTRING via WKT equals the WKB codec's linearization of
    the SAME arc (both call the same kernel; this pins the plumbing)."""
    pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
    g = wkt.decode("CIRCULARSTRING (0 0, 1 1, 2 0)")
    want = wkb._linearize_arcs(np.asarray(pts, np.float64))
    got = np.asarray(g["coordinates"])
    assert got.shape == want.shape and np.allclose(got, want)
    assert len(got) > 3                      # densified
    # compound stitching drops the junction vertex
    c = wkt.decode(
        "COMPOUNDCURVE ((0 0, 1 0), CIRCULARSTRING (1 0, 2 1, 3 0))")
    xs = [p[0] for p in c["coordinates"]]
    assert xs.count(1.0) == 1


def test_wkt_surface_normalization():
    g = wkt.decode("TRIANGLE ((0 0, 1 0, 0 1, 0 0))")
    assert g["type"] == "Polygon"
    g = wkt.decode("TIN (((0 0, 1 0, 0 1, 0 0)), ((1 1, 2 1, 1 2, 1 1)))")
    assert g["type"] == "MultiPolygon" and len(g["coordinates"]) == 2
    g = wkt.decode("CURVEPOLYGON (CIRCULARSTRING (0 0, 2 2, 4 0), "
                   "(4 0, 0 0))")
    assert g["type"] == "Polygon" and len(g["coordinates"][0]) > 3
    g = wkt.decode("GEOMETRYCOLLECTION (POINT (1 2), "
                   "LINESTRING (0 0, 1 1))")
    assert [m["type"] for m in g["geometries"]] == ["Point", "LineString"]


REF_CSV = "/root/reference/tests/data/curves_line.csv"


@pytest.mark.skipif(not os.path.exists(REF_CSV),
                    reason="reference test data not present")
def test_reference_curves_csv_contract(spark):
    """The reference's curves_line.csv through the engine csv driver +
    WKT decode: 9 features, every curve type converts to a linear
    MultiLineString (GDAL RFC 49 behavior the reference test checks)."""
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from fiona_spark.sources import drivers
    df = drivers.open_dataset(spark, REF_CSV, driver="csv")
    assert df.count() == 9
    # the csv driver AUTO-decodes the WKT column (fiona.open parity:
    # features with geometry, curves linearized)
    assert df.filter("geom_type = 'MultiLineString'").count() == 9
    assert df.select("xmin").first()["xmin"] is not None

    @F.pandas_udf("geom_type string, n_parts int, n_verts int")
    def dec(wkt_s: pd.Series) -> pd.DataFrame:
        rows = []
        for t in wkt_s:
            g = wkt.decode(t)
            rows.append({"geom_type": g["type"],
                         "n_parts": len(g["coordinates"]),
                         "n_verts": sum(len(p) for p in g["coordinates"])})
        return pd.DataFrame(rows)

    out = df.select(dec("WKT").alias("g")).select("g.*").collect()
    assert len(out) == 9
    assert all(r["geom_type"] == "MultiLineString" for r in out)
    # the pure-arc row (row 3: one CIRCULARSTRING compound) densifies
    assert max(r["n_verts"] for r in out) > 90


def test_wkt_random_roundtrip_fuzz():
    """120 random geometries: decode(encode(g)) == g bit-exactly
    (repr floats round-trip)."""
    rng = np.random.default_rng(23)

    def rand_pt():
        return [float(np.round(rng.uniform(-180, 180), 9)),
                float(np.round(rng.uniform(-90, 90), 9))]

    def rand_ring():
        n = int(rng.integers(3, 8))
        ring = [rand_pt() for _ in range(n)]
        return ring + [ring[0]]

    for _ in range(120):
        kind = rng.integers(0, 6)
        if kind == 0:
            g = {"type": "Point", "coordinates": rand_pt()}
        elif kind == 1:
            g = {"type": "LineString",
                 "coordinates": [rand_pt() for _ in range(
                     int(rng.integers(2, 6)))]}
        elif kind == 2:
            g = {"type": "Polygon",
                 "coordinates": [rand_ring() for _ in range(
                     int(rng.integers(1, 3)))]}
        elif kind == 3:
            g = {"type": "MultiPoint",
                 "coordinates": [rand_pt() for _ in range(
                     int(rng.integers(1, 5)))]}
        elif kind == 4:
            g = {"type": "MultiLineString",
                 "coordinates": [[rand_pt() for _ in range(3)]
                                 for _ in range(int(rng.integers(1, 4)))]}
        else:
            g = {"type": "MultiPolygon",
                 "coordinates": [[rand_ring()]
                                 for _ in range(int(rng.integers(1, 3)))]}
        assert wkt.decode(wkt.encode(g)) == g
