"""r6 property guards: fuzzed differentials for the round's codecs —
DGN middle-endian integers, SEG-Y IBM floats against an independent
test-side encoder, PDS ODL value forms, and WKT round trips over
random projection parameters."""

import math
import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from fiona_spark import geom
from fiona_spark import crs as crsmod


# ---------------------------------------------------------------------------
# DGN v7 PDP-11 word order
# ---------------------------------------------------------------------------

def _dgn_word_bytes(v32: int) -> bytes:
    v = v32 & 0xFFFFFFFF
    hi, lo = (v >> 16) & 0xFFFF, v & 0xFFFF
    return bytes([hi & 0xFF, hi >> 8, lo & 0xFF, lo >> 8])


@settings(deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_dgn_int32_middle_endian_roundtrip(v):
    from fiona_spark.sources.dgn import _i32
    assert _i32(_dgn_word_bytes(v), 0) == v


@settings(deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_dgn_double_word_swap_roundtrip(x):
    from fiona_spark.sources.dgn import _dgn_double
    bits = struct.unpack("<Q", struct.pack("<d", x))[0]
    raw = b"".join(
        bytes([(bits >> s) & 0xFF, (bits >> (s + 8)) & 0xFF])
        for s in (48, 32, 16, 0))
    got = _dgn_double(raw, 0)
    assert got == x or (math.isnan(got) and math.isnan(x))


# ---------------------------------------------------------------------------
# SEG-Y IBM float vs an independent encoder
# ---------------------------------------------------------------------------

def _ieee_to_ibm(x: float) -> int:
    """Test-side IBM System/360 float encoder (independent of the
    reader's decoder): normalize mantissa into [1/16, 1) with a
    base-16 exponent."""
    if x == 0.0:
        return 0
    sign = 0x80000000 if x < 0 else 0
    m = abs(x)
    e = 0
    while m >= 1.0:
        m /= 16.0
        e += 1
    while m < 1.0 / 16.0:
        m *= 16.0
        e -= 1
    mant = int(round(m * (1 << 24)))
    if mant == 1 << 24:          # rounding overflow: renormalize
        mant >>= 4
        e += 1
    return sign | ((e + 64) << 24) | mant


@given(st.floats(min_value=-1e18, max_value=1e18,
                 allow_nan=False, allow_infinity=False)
       .filter(lambda v: v == 0.0 or abs(v) > 1e-18))
@settings(max_examples=300, deadline=None)
def test_segy_ibm_float_decode_matches_independent_encoder(x):
    from fiona_spark.sources.segy import _ibm_to_float
    raw = np.array([_ieee_to_ibm(x)], dtype=np.uint32)
    got = _ibm_to_float(raw)[0]
    # IBM floats carry a 24-bit mantissa: worst-case relative error
    # after round-trip is ~2^-21 (hex normalization can leave up to
    # three leading zero bits)
    assert got == pytest.approx(x, rel=2**-20, abs=1e-30)


# ---------------------------------------------------------------------------
# PDS ODL value forms
# ---------------------------------------------------------------------------

def test_odl_value_forms():
    from fiona_spark.sources.pds import parse_odl
    label = (
        'A = 5\r\nB = "quoted str"\r\nC = (1, 2, 3)\r\n'
        "D = 5 <BYTES>\r\nE = ('F.TAB', 12)\r\n"
        "F = -3.25\r\nG = bareword\r\nEND\r\n")
    d = parse_odl(label)
    assert d["A"] == 5 and d["B"] == "quoted str"
    assert d["C"] == (1.0, 2.0, 3.0) or d["C"] == (1, 2, 3)
    assert d["D"] == (5, "BYTES")
    assert d["E"] == ("F.TAB", 12)
    assert d["F"] == -3.25 and d["G"] == "bareword"


def test_odl_nested_objects_preserve_order():
    from fiona_spark.sources.pds import parse_odl
    label = (
        "OBJECT = TABLE\r\n"
        "  OBJECT = COLUMN\r\n    NAME = A\r\n  END_OBJECT = COLUMN\r\n"
        "  OBJECT = COLUMN\r\n    NAME = B\r\n  END_OBJECT = COLUMN\r\n"
        "END_OBJECT = TABLE\r\nEND\r\n")
    d = parse_odl(label)
    (t, table), = d["objects"]
    assert t == "TABLE"
    names = [c["NAME"] for _t, c in table["objects"]]
    assert names == ["A", "B"]


# ---------------------------------------------------------------------------
# WKT round trip over fuzzed parameters (per family)
# ---------------------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    fam=st.sampled_from(["tmerc", "lcc", "aea", "laea"]),
    lat0=st.floats(min_value=-60, max_value=60),
    lon0=st.floats(min_value=-170, max_value=170),
    x0=st.floats(min_value=0, max_value=1e6),
    y0=st.floats(min_value=0, max_value=1e7),
    dlat=st.floats(min_value=1.0, max_value=15.0),
)
def test_wkt_roundtrip_fuzzed_parameters(fam, lat0, lon0, x0, y0, dlat):
    if fam == "tmerc":
        p4 = (f"+proj=tmerc +lat_0={lat0} +lon_0={lon0} +k=0.9996 "
              f"+x_0={x0} +y_0={y0} +datum=WGS84")
    elif fam == "laea":
        p4 = (f"+proj=laea +lat_0={lat0} +lon_0={lon0} "
              f"+x_0={x0} +y_0={y0} +datum=WGS84")
    else:
        lat1, lat2 = lat0 + dlat / 2, lat0 + dlat
        p4 = (f"+proj={fam} +lat_0={lat0} +lon_0={lon0} "
              f"+lat_1={lat1} +lat_2={lat2} "
              f"+x_0={x0} +y_0={y0} +datum=WGS84")
    c = crsmod.CRS.from_string(p4)
    c2 = crsmod.CRS.from_wkt(c.to_wkt())
    k1 = geom.kernel_from_proj4(c.to_proj4())
    k2 = geom.kernel_from_proj4(c2.to_proj4())
    rng = np.random.default_rng(0)
    lng = np.clip(lon0 + rng.uniform(-8, 8, 16), -179.9, 179.9)
    lat = np.clip(lat0 + rng.uniform(-5, 5, 16), -84.0, 84.0)
    x1, y1 = k1[0](lng, lat)
    x2, y2 = k2[0](lng, lat)
    np.testing.assert_allclose(x1, x2, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y1, y2, rtol=0, atol=1e-6)
