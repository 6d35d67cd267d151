"""Conic/azimuthal closed-form CRS families (r5): Albers EPSG:5070,
LCC-2SP EPSG:2154, LAEA EPSG:3035.

Oracles are the projections' DEFINING properties, computed independently
of the kernels (numerical quadrature for ellipsoid areas, finite
differences for scale factors) — not re-derived from the code:

  * LCC: scale factor along both standard parallels == 1, and
    conformality (meridian scale == parallel scale) at fuzzed points.
  * Albers / LAEA: projected area of a small region == ellipsoid
    surface area of that region (trapezoid quadrature of the exact
    area element a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2).
  * All: grid-origin anchors from the EPSG parameter sheets and
    forward->inverse round trips < 1e-9 deg.
"""

import numpy as np
import pytest

from fiona_spark import geom

A = geom.GRS80_A
E2 = geom.GRS80_F * (2.0 - geom.GRS80_F)

FAMILIES = [
    ("EPSG:5070", geom.to_5070, geom.from_5070,
     (-120.0, -75.0, 25.0, 49.0), (-96.0, 23.0)),
    ("EPSG:2154", geom.to_2154, geom.from_2154,
     (-4.5, 8.0, 42.0, 51.0), (3.0, 46.5)),
    ("EPSG:3035", geom.to_3035, geom.from_3035,
     (-10.0, 30.0, 35.0, 70.0), (10.0, 52.0)),
]

ORIGIN_XY = {"EPSG:5070": (0.0, 0.0),
             "EPSG:2154": (700_000.0, 6_600_000.0),
             "EPSG:3035": (4_321_000.0, 3_210_000.0)}


def _parallel_radius(lat):
    """Radius of the parallel circle on the ellipsoid (exact)."""
    s = np.sin(np.deg2rad(lat))
    return A * np.cos(np.deg2rad(lat)) / np.sqrt(1.0 - E2 * s * s)


def _meridian_arc(lat1, lat2, n=20001):
    """Meridian arc length by trapezoid quadrature of M(phi)."""
    phi = np.deg2rad(np.linspace(lat1, lat2, n))
    m = A * (1.0 - E2) / (1.0 - E2 * np.sin(phi) ** 2) ** 1.5
    return float(np.trapz(m, phi))


def _ellipsoid_area(lng1, lng2, lat1, lat2, n=20001):
    """Exact ellipsoid surface area of a lng/lat rectangle (quadrature
    of the area element — independent of the authalic-q closed form
    the kernels use)."""
    phi = np.deg2rad(np.linspace(lat1, lat2, n))
    el = A * A * (1.0 - E2) * np.cos(phi) / (1.0 - E2 * np.sin(phi) ** 2) ** 2
    return float(np.trapz(el, phi)) * np.deg2rad(lng2 - lng1)


@pytest.mark.parametrize("name,fwd,inv,dom,origin", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_origin_anchor(name, fwd, inv, dom, origin):
    x, y = fwd(np.array([origin[0]]), np.array([origin[1]]))
    ex, ey = ORIGIN_XY[name]
    assert abs(float(x[0]) - ex) < 1e-6 and abs(float(y[0]) - ey) < 1e-6


@pytest.mark.parametrize("name,fwd,inv,dom,origin", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_roundtrip_fuzz(name, fwd, inv, dom, origin):
    rng = np.random.default_rng(42)
    lng = rng.uniform(dom[0], dom[1], 4000)
    lat = rng.uniform(dom[2], dom[3], 4000)
    x, y = fwd(lng, lat)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    lng2, lat2 = inv(x, y)
    assert np.max(np.abs(lng2 - lng)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


@pytest.mark.parametrize("sp", [44.0, 49.0])
def test_lcc_standard_parallel_scale_is_one(sp):
    """Along a standard parallel the LCC scale factor is exactly 1:
    a projected arc there equals the true ellipsoidal parallel arc."""
    dl = 1e-4
    lng = np.array([2.0, 2.0 + dl])
    x, y = geom.to_2154(lng, np.array([sp, sp]))
    chord = float(np.hypot(x[1] - x[0], y[1] - y[0]))
    true_arc = _parallel_radius(sp) * np.deg2rad(dl)
    assert abs(chord / true_arc - 1.0) < 1e-9


def test_lcc_conformality():
    """Meridian scale == parallel scale (finite differences)."""
    rng = np.random.default_rng(7)
    lng = rng.uniform(-4.0, 8.0, 50)
    lat = rng.uniform(42.0, 51.0, 50)
    d = 1e-5
    x0, y0 = geom.to_2154(lng, lat)
    xp, yp = geom.to_2154(lng + d, lat)
    xm, ym = geom.to_2154(lng, lat + d)
    k = np.hypot(xp - x0, yp - y0) / (_parallel_radius(lat) * np.deg2rad(d))
    marc = np.array([_meridian_arc(la, la + d, 101) for la in lat])
    h = np.hypot(xm - x0, ym - y0) / marc
    assert np.max(np.abs(h / k - 1.0)) < 1e-5


@pytest.mark.parametrize("sp", [29.5, 45.5])
def test_albers_standard_parallel_scale_is_one(sp):
    dl = 1e-4
    lng = np.array([-96.0, -96.0 + dl])
    x, y = geom.to_5070(lng, np.array([sp, sp]))
    chord = float(np.hypot(x[1] - x[0], y[1] - y[0]))
    true_arc = _parallel_radius(sp) * np.deg2rad(dl)
    assert abs(chord / true_arc - 1.0) < 1e-9


@pytest.mark.parametrize("name,fwd", [("EPSG:5070", geom.to_5070),
                                      ("EPSG:3035", geom.to_3035)])
@pytest.mark.parametrize("cell", [(-100.0, 35.0), (-80.0, 44.0),
                                  (5.0, 47.0), (20.0, 60.0)])
def test_equal_area_property(name, fwd, cell):
    """Projected area of a 0.01-deg cell equals its ellipsoid area
    (edges densified so polygon-vs-curve error is negligible)."""
    lng0, lat0 = cell
    if name == "EPSG:3035" and lng0 < 0:
        lng0 += 105.0  # keep the CONUS cells for Albers only
    d, k = 0.01, 400
    t = np.linspace(0.0, 1.0, k)
    lng = np.concatenate([lng0 + d * t, np.full(k, lng0 + d),
                          lng0 + d * (1 - t), np.full(k, lng0)])
    lat = np.concatenate([np.full(k, lat0), lat0 + d * t,
                          np.full(k, lat0 + d), lat0 + d * (1 - t)])
    x, y = fwd(lng, lat)
    # center first: raw shoelace on ~4e6 m offsets cancels 8 digits
    # against a ~6e5 m^2 cell and drowns the check in float noise
    x = x - x.mean()
    y = y - y.mean()
    proj_area = abs(float(
        np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0
    true_area = _ellipsoid_area(lng0, lng0 + d, lat0, lat0 + d)
    assert abs(proj_area / true_area - 1.0) < 1e-9


def test_laea_center_azimuth_and_symmetry():
    """Due east/west of the center project to +-x with equal |x|, due
    north/south to +-y: the oblique LAEA is symmetric about its
    center meridian."""
    x, y = geom.to_3035(np.array([9.0, 11.0]), np.array([52.0, 52.0]))
    assert abs((x[0] - 4_321_000.0) + (x[1] - 4_321_000.0)) < 1e-6
    assert abs(y[0] - y[1]) < 1e-6
    x2, y2 = geom.to_3035(np.array([10.0, 10.0]), np.array([51.0, 53.0]))
    assert abs(x2[0] - 4_321_000.0) < 1e-6 and abs(x2[1] - 4_321_000.0) < 1e-6


def test_crs_registry_and_udf_pairs(spark):
    """CRS surface + transform_udf wiring, incl. composition through
    4326 (5070 -> 3035 with no direct entry)."""
    from pyspark.sql import functions as F

    from fiona_spark.crs import CRS
    from fiona_spark.functions.geometry import transform_udf

    for code, kind in [(5070, "aea"), (2154, "lcc"), (3035, "laea")]:
        c = CRS.from_epsg(code)
        assert c.is_projected and c.linear_units == "metre"
        assert f"+proj={kind}" in c.to_proj4()
        assert CRS.from_string(c.to_proj4()) == c

    df = spark.createDataFrame(
        [(5.0, 47.0), (7.5, 44.2)], "lng double, lat double")
    got = (df.select(transform_udf("EPSG:4326", "EPSG:2154")(
        F.col("lng"), F.col("lat")).alias("p"))
           .select("p.x", "p.y").toPandas())
    want = geom.to_2154(np.array([5.0, 7.5]), np.array([47.0, 44.2]))
    assert np.allclose(got["x"], want[0]) and np.allclose(got["y"], want[1])

    comp = (df.select(transform_udf("EPSG:4326", "EPSG:5070")(
        F.col("lng"), F.col("lat")).alias("p"))
            .select(transform_udf("EPSG:5070", "EPSG:3035")(
                F.col("p.x"), F.col("p.y")).alias("q"))
            .select("q.x", "q.y").toPandas())
    direct = geom.to_3035(np.array([5.0, 7.5]), np.array([47.0, 44.2]))
    assert np.allclose(comp["x"], direct[0], atol=1e-6)
    assert np.allclose(comp["y"], direct[1], atol=1e-6)
