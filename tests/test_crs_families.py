"""Parameterized projection families (r5): arbitrary proj4 -> kernel.

The reference reprojects between any two PROJ CRSs
(`fiona/transform.py:11-124`); the engine covers the same space for its
implemented kernel families with ARBITRARY parameters, not just EPSG
presets — `geom.kernel_from_proj4` + codeless `CRS.from_string`.

Oracles here are independent of the code under test: published EPSG
worked examples, exact defining identities (x = a*k0*lambda on a
cylinder), finite-difference conformality/scale checks, and round
trips.
"""

import numpy as np
import pytest

from fiona_spark import geom
from fiona_spark import crs as crsmod
from fiona_spark import transform as tr
from fiona_spark.functions.geometry import pair_fn

RNG = np.random.default_rng(42)


def _scale_along_parallel(fwd, lat, e2, a, lng=1.0):
    """Finite-difference scale factor along a parallel (per-meter on
    the ellipsoid: parallel radius = a cos(phi)/sqrt(1-e2 sin^2))."""
    h = 1e-6
    (x1, y1) = fwd(np.array([lng - h]), np.array([lat]))
    (x2, y2) = fwd(np.array([lng + h]), np.array([lat]))
    dm = np.hypot(x2 - x1, y2 - y1)[0]
    s = np.sin(np.deg2rad(lat))
    ground = (a * np.cos(np.deg2rad(lat)) / np.sqrt(1.0 - e2 * s * s)
              * np.deg2rad(2 * h))
    return dm / ground


E2_WGS = geom.WGS84_F * (2.0 - geom.WGS84_F)


# ---------------------------------------------------------------------------
# published-anchor tests
# ---------------------------------------------------------------------------

def test_polar_stereographic_epsg_worked_example():
    """EPSG Guidance Note 7-2, Polar Stereographic variant B worked
    example (Australian Antarctic / EPSG:3032 parameters): 75S 120E ->
    E 7255380.79, N 7053389.56."""
    fwd, inv = geom.kernel_from_proj4(
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 "
        "+x_0=6000000 +y_0=6000000 +datum=WGS84")
    x, y = fwd(np.array([120.0]), np.array([-75.0]))
    assert abs(x[0] - 7255380.79) < 0.01
    assert abs(y[0] - 7053389.56) < 0.01
    lng, lat = inv(x, y)
    assert abs(lng[0] - 120.0) < 1e-9 and abs(lat[0] + 75.0) < 1e-9


def test_world_mercator_equator_spacing_exact():
    """EPSG:3395: x is EXACTLY a * lambda (the defining property of a
    k0=1 Mercator on the ellipsoid), y(0) = 0, conformal everywhere."""
    fwd, inv = geom.kernel_from_proj4(crsmod.CRS.from_epsg(3395).to_proj4())
    lngs = np.array([-180.0, -45.0, 0.0, 100.0, 180.0])
    x, y = fwd(lngs, np.zeros(5))
    assert np.allclose(x, geom.WGS84_A * np.deg2rad(lngs), rtol=0, atol=1e-6)
    assert np.all(np.abs(y) < 1e-9)
    # conformality: scale along parallel == scale along meridian
    h = 1e-6
    for lat in (-60.0, -20.0, 37.0, 71.0):
        sp = _scale_along_parallel(fwd, lat, E2_WGS, geom.WGS84_A)
        (x1, y1) = fwd(np.array([1.0]), np.array([lat - h]))
        (x2, y2) = fwd(np.array([1.0]), np.array([lat + h]))
        s = np.sin(np.deg2rad(lat))
        m_rad = (geom.WGS84_A * (1 - E2_WGS)
                 / (1.0 - E2_WGS * s * s) ** 1.5)
        sm = np.hypot(x2 - x1, y2 - y1)[0] / (m_rad * np.deg2rad(2 * h))
        assert abs(sp / sm - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# family properties
# ---------------------------------------------------------------------------

def test_tmerc_origin_and_utm_equivalence():
    fwd, inv = geom.make_tmerc(49.0, -2.0, 0.9996012717,
                               400_000.0, -100_000.0)
    x, y = fwd(np.array([-2.0]), np.array([49.0]))
    assert abs(x[0] - 400_000.0) < 1e-6 and abs(y[0] + 100_000.0) < 1e-6
    # parameterized tmerc with UTM params == the UTM preset family
    f2, _ = geom.kernel_from_proj4("+proj=tmerc +lat_0=0 +lon_0=15 "
                                   "+k=0.9996 +x_0=500000 +y_0=0 "
                                   "+datum=WGS84")
    xs = RNG.uniform(9, 21, 50)
    ys = RNG.uniform(-80, 84, 50)
    xa, ya = f2(xs, ys)
    xb, yb = geom.to_utm(xs, ys, 33, True)
    assert np.allclose(xa, xb, atol=1e-9) and np.allclose(ya, yb, atol=1e-9)


def test_tmerc_lat0_roundtrip_fuzz():
    fwd, inv = geom.make_tmerc(-37.0, 145.0, 1.0, 2_500_000.0,
                               2_500_000.0, geom.GRS80_A, geom.GRS80_F)
    lngs = RNG.uniform(140, 150, 200)
    lats = RNG.uniform(-44, -30, 200)
    lng2, lat2 = inv(*fwd(lngs, lats))
    assert np.max(np.abs(lng2 - lngs)) < 1e-9
    assert np.max(np.abs(lat2 - lats)) < 1e-9


def test_cea_true_scale_parallel_and_roundtrip():
    fwd, inv = geom.kernel_from_proj4("+proj=cea +lat_ts=30 +ellps=GRS80")
    e2 = geom.GRS80_F * (2.0 - geom.GRS80_F)
    assert abs(_scale_along_parallel(fwd, 30.0, e2, geom.GRS80_A)
               - 1.0) < 1e-6
    lngs = RNG.uniform(-179, 179, 200)
    lats = RNG.uniform(-89, 89, 200)
    lng2, lat2 = inv(*fwd(lngs, lats))
    assert np.max(np.abs(lng2 - lngs)) < 1e-9
    assert np.max(np.abs(lat2 - lats)) < 1e-8


def test_lcc_and_aea_one_parallel_degenerate_limits():
    """lat_1 == lat_2 must hit the analytic n = sin(lat_1) limit (not
    0/0) and keep the family's defining property at the parallel."""
    e2 = geom.GRS80_F * (2.0 - geom.GRS80_F)
    for p4, lat1 in [("+proj=lcc +lat_0=45 +lat_1=45 +lon_0=0 "
                      "+ellps=GRS80", 45.0),
                     ("+proj=aea +lat_0=40 +lat_1=40 +lat_2=40 +lon_0=0 "
                      "+ellps=GRS80", 40.0)]:
        fwd, inv = geom.kernel_from_proj4(p4)
        assert np.isfinite(fwd(np.array([3.0]), np.array([50.0]))[0][0])
        assert abs(_scale_along_parallel(fwd, lat1, e2, geom.GRS80_A)
                   - 1.0) < 1e-6
        lngs = RNG.uniform(-30, 30, 100)
        lats = RNG.uniform(lat1 - 20, lat1 + 20, 100)
        lng2, lat2 = inv(*fwd(lngs, lats))
        assert np.max(np.abs(lng2 - lngs)) < 1e-9
        assert np.max(np.abs(lat2 - lats)) < 1e-8


def test_polar_stere_north_axis_sense_and_roundtrip():
    fwd, inv = geom.kernel_from_proj4(crsmod.CRS.from_epsg(3413).to_proj4())
    x, y = fwd(np.array([-45.0, 45.0]), np.array([80.0, 80.0]))
    assert abs(x[0]) < 1e-6 and y[0] < 0          # along lon0: -y axis
    assert x[1] > 0 and abs(y[1]) < 1e-6          # lon0+90: +x axis
    lngs = RNG.uniform(-180, 180, 200)
    lats = RNG.uniform(60, 89.9, 200)
    lng2, lat2 = inv(*fwd(lngs, lats))
    # wrap lng difference
    dl = (lng2 - lngs + 180.0) % 360.0 - 180.0
    assert np.max(np.abs(dl)) < 1e-9
    assert np.max(np.abs(lat2 - lats)) < 1e-9


# ---------------------------------------------------------------------------
# dispatch + CRS surface
# ---------------------------------------------------------------------------

def test_kernel_dispatch_rejects_unknown_families():
    assert geom.kernel_from_proj4("+proj=robin +datum=WGS84") is None
    assert geom.kernel_from_proj4("+proj=stere +lat_0=40 +datum=WGS84") \
        is None                                   # oblique stere: out
    with pytest.raises(crsmod.CRSError):
        crsmod.CRS.from_string("+proj=robin +datum=WGS84")


def test_codeless_crs_object_surface():
    p4 = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
          "+x_0=400000 +y_0=-100000 +ellps=GRS80 +units=m +no_defs")
    c = crsmod.CRS.from_user_input(p4)
    assert c.to_epsg() is None and c.to_authority() is None
    assert c.is_projected and not c.is_geographic
    assert c.linear_units == "metre"
    assert crsmod.CRS.from_string(c.to_proj4()) == c
    assert hash(crsmod.CRS.from_string(c.to_proj4())) == hash(c)
    assert c != crsmod.CRS.from_epsg(4326)
    # registry-matching proj4 still resolves to its EPSG code
    c2 = crsmod.CRS.from_user_input(crsmod.CRS.from_epsg(3031).to_proj4())
    assert c2.to_epsg() == 3031


def test_pair_fn_composes_epsg_and_proj4():
    fn = pair_fn("EPSG:3413", "EPSG:3031")
    x, y = fn(np.array([100_000.0]), np.array([-2_000_000.0]))
    bx, by = pair_fn("EPSG:3031", "EPSG:3413")(x, y)
    assert abs(bx[0] - 100_000.0) < 1e-6 and abs(by[0] + 2_000_000.0) < 1e-6
    # proj4 -> proj4 composition through 4326
    a = "+proj=laea +lat_0=45 +lon_0=8 +ellps=GRS80"
    b = "+proj=aea +lat_0=40 +lat_1=42 +lat_2=48 +lon_0=8 +ellps=GRS80"
    x, y = pair_fn(a, b)(np.array([200_000.0]), np.array([300_000.0]))
    bx, by = pair_fn(b, a)(x, y)
    assert abs(bx[0] - 200_000.0) < 1e-6 and abs(by[0] - 300_000.0) < 1e-6
    with pytest.raises(ValueError):
        pair_fn("EPSG:4326", "+proj=robin +datum=WGS84")


def test_driver_transform_accepts_codeless_crs():
    xs, ys = tr.transform({"proj": "tmerc", "lat_0": 10, "lon_0": 5,
                           "k": 1, "x_0": 0, "y_0": 0, "ellps": "WGS84"},
                          "EPSG:4326", [0.0], [0.0])
    assert abs(xs[0] - 5.0) < 1e-9 and abs(ys[0] - 10.0) < 1e-9
    g = tr.transform_geom(
        "EPSG:4326", "+proj=laea +lat_0=45 +lon_0=8 +ellps=GRS80",
        {"type": "Point", "coordinates": [8.0, 45.0]})
    assert abs(g["coordinates"][0]) < 1e-6 and abs(g["coordinates"][1]) < 1e-6


def test_transform_udf_proj4_string(spark):
    from fiona_spark.functions.geometry import transform_udf
    df = spark.createDataFrame([(0, 120.0, -75.0)], "i long, lng double, "
                               "lat double")
    u = transform_udf("EPSG:4326", "+proj=stere +lat_0=-90 +lat_ts=-71 "
                      "+lon_0=70 +x_0=6000000 +y_0=6000000 +datum=WGS84")
    row = df.select(u("lng", "lat").alias("p")).collect()[0]["p"]
    assert abs(row["x"] - 7255380.79) < 0.01
    assert abs(row["y"] - 7053389.56) < 0.01
