"""Regression guards for the round-5 advice fixes.

Each test pins one defect from ADVICE.md r4:
  1. env.insp broke on every non-parquet format (hardcoded parquet read)
  2. write_shapefile ignored ESRI ring winding (shells CW, holes CCW)
  3. dbf numeric overflow silently truncated digits
  4. GPX routes layer must be LineString (only tracks are Multi)
  5. 'POINT EMPTY' crashed rings_from_geometry with IndexError
Plus the r4-verdict polish: hamming_pairs recall warning.
"""

import os
import struct
import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. insp on non-parquet datasets
# ---------------------------------------------------------------------------

def test_insp_reads_non_parquet_head(spark, tmp_path):
    from fiona_spark.env import insp
    p = str(tmp_path / "pts.csv")
    with open(p, "w") as fh:
        fh.write("id,wkt\n1,POINT (2 3)\n2,POINT (4 5)\n")
    rec = insp(spark, p, n=1)
    assert rec["count"] == 2
    assert len(rec["head"]) == 1
    assert rec["head"][0]["id"] in (1, "1")


# ---------------------------------------------------------------------------
# 2. ESRI ring winding on write
# ---------------------------------------------------------------------------

def _ring_signed_area(pts):
    x, y = pts[:, 0], pts[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2


def _shp_rings(path):
    """Parse the first polygon record of a .shp into raw point rings."""
    with open(path, "rb") as fh:
        data = fh.read()
    body = data[108:]
    n_parts, n_pts = struct.unpack("<2i", body[36:44])
    parts = np.frombuffer(body, "<i4", n_parts, 44)
    pts = np.frombuffer(body, "<f8", 2 * n_pts,
                        44 + 4 * n_parts).reshape(n_pts, 2)
    bounds = np.append(parts, n_pts)
    return [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]


def test_write_shapefile_enforces_esri_winding(spark, tmp_path):
    """Engine convention (shell CCW, hole CW) is EXACTLY inverted from
    the ESRI spec; the writer must re-wind so GDAL/fiona classify the
    shell as a shell."""
    from fiona_spark.sources.shapefile import read_shapefile, write_shapefile
    shell_ccw = ([0.0, 10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 10.0, 0.0])
    hole_cw = ([2.0, 2.0, 5.0, 5.0, 2.0], [2.0, 5.0, 5.0, 2.0, 2.0])
    df = spark.createDataFrame(
        [(0, "Polygon", [shell_ccw[0], hole_cw[0]],
          [shell_ccw[1], hole_cw[1]], "a")],
        "fid long, geom_type string, rings_xs array<array<double>>, "
        "rings_ys array<array<double>>, name string")
    out = str(tmp_path / "wind.shp")
    write_shapefile(df, out)
    rings = _shp_rings(out)
    assert len(rings) == 2
    areas = sorted((_ring_signed_area(r) for r in rings), key=abs)
    # hole (smaller |area|) CCW => positive; shell CW => negative
    assert areas[0] > 0 and areas[1] < 0
    # round-trip through the engine reader still yields the same points
    back = read_shapefile(spark, out).select("rings_xs").first()
    assert sorted(map(len, back[0])) == [5, 5]


def test_dbf_numeric_overflow_raises(spark, tmp_path):
    from fiona_spark.errors import DriverError
    from fiona_spark.sources.shapefile import write_shapefile
    df = spark.createDataFrame(
        [(0, "Point", [[1.0]], [[1.0]], 1e30)],
        "fid long, geom_type string, rings_xs array<array<double>>, "
        "rings_ys array<array<double>>, big double")
    with pytest.raises(DriverError, match="exceeds dbf field width"):
        write_shapefile(df, str(tmp_path / "ovf.shp"))


# ---------------------------------------------------------------------------
# 4. GPX routes geometry type
# ---------------------------------------------------------------------------

def test_gpx_routes_are_linestring(spark, tmp_path):
    from fiona_spark.sources import gpx
    p = str(tmp_path / "r.gpx")
    with open(p, "w") as fh:
        fh.write(
            '<?xml version="1.0"?>\n'
            '<gpx xmlns="http://www.topografix.com/GPX/1/1">\n'
            '<rte><name>r1</name>'
            '<rtept lon="1.0" lat="2.0"/><rtept lon="3.0" lat="4.0"/>'
            '</rte></gpx>\n')
    df = gpx.read_gpx(spark, p, "routes")
    row = df.first()
    assert row["geom_type"] == "LineString"
    assert row["rings_xs"] == [[1.0, 3.0]]
    # tracks stay MultiLineString (reference GPX driver contract)
    ref = "/root/reference/tests/data/test_gpx.gpx"
    if os.path.exists(ref):
        assert gpx.read_gpx(spark, ref, "tracks").first()[
            "geom_type"] == "MultiLineString"


# ---------------------------------------------------------------------------
# 5. EMPTY geometries through the ring model
# ---------------------------------------------------------------------------

def test_point_empty_rings_do_not_crash():
    from fiona_spark import model, wkt
    g = wkt.decode("POINT EMPTY")
    t, rxs, rys = model.rings_from_geometry(g)
    assert t == "Point" and rxs == [] and rys == []
    t2, rxs2, _ = model.rings_from_geometry(
        {"type": "Polygon", "coordinates": []})
    assert t2 == "Polygon" and rxs2 == []


# ---------------------------------------------------------------------------
# hamming_pairs recall warning
# ---------------------------------------------------------------------------

def test_hamming_pairs_warns_past_pigeonhole_bound(spark):
    from fiona_spark.operators import dedup
    df = spark.createDataFrame([(1, 0), (2, 1)], "vid long, h long")
    with pytest.warns(RuntimeWarning, match="does not guarantee"):
        dedup.hamming_pairs(df, "vid", "h", max_dist=10, band_bits=16)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dedup.hamming_pairs(df, "vid", "h", max_dist=3, band_bits=16)
        dedup.hamming_pairs(df, "vid", "h", max_dist=10, band_bits=16,
                            warn_recall=False)


# ---------------------------------------------------------------------------
# tile_parent retired from the 50-query contract (slot given to
# shapefile_source) — its differential lives on here: deriving the
# coarse cell FROM the fine cell id must equal recomputing it from
# coordinates, on fuzzed points including the poles/antimeridian.
# ---------------------------------------------------------------------------

def test_cell_parent_matches_recompute_from_coords():
    from fiona_spark import cells
    rng = np.random.default_rng(5050)
    lng = np.concatenate([rng.uniform(-180, 180, 5000),
                          [-180.0, 179.999999, 0.0]])
    lat = np.concatenate([rng.uniform(-90, 90, 5000),
                          [89.999999, -90.0, 0.0]])
    for fine_res, coarse_res in ((12, 5), (12, 0), (7, 6)):
        fine = cells.cell_id(lng, lat, fine_res)
        derived_parent = cells.parent(fine, fine_res - coarse_res)
        recomputed = cells.cell_id(lng, lat, coarse_res)
        assert (derived_parent == recomputed).all()
