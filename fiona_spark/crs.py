"""CRS metadata surface (reference `fiona/crs.pyx:56-852` subset).

The reference wraps PROJ; this engine computes with closed-form
transforms (fiona_spark.geom / functions.geometry.transform_udf), so the
CRS class here is a METADATA object: it records which system a table's
coordinates are in, round-trips through WKT/EPSG/dict/proj4 forms, and
travels with datasets as an iceberg-like table property — the reference
stores exactly this in each layer's metadata (`fiona/collection.py`
crs/crs_wkt properties).

Only the systems the engine can actually transform (plus a registry of
common codes) are bundled; ``from_user_input`` accepts the same input
shapes as the reference (`crs.pyx:731-803`): CRS, int, "EPSG:nnnn",
"epsg:nnnn", proj4 strings, WKT strings, and {'init': 'epsg:nnnn'} /
proj4 dicts.
"""

from __future__ import annotations

import re

# code -> (name, kind, unit, proj4)
_REGISTRY: dict[int, tuple[str, str, str, str]] = {
    4326: ("WGS 84", "geographic", "degree",
           "+proj=longlat +datum=WGS84 +no_defs"),
    3857: ("WGS 84 / Pseudo-Mercator", "projected", "metre",
           "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 "
           "+y_0=0 +k=1 +units=m +nadgrids=@null +wktext +no_defs"),
    6933: ("WGS 84 / NSIDC EASE-Grid 2.0 Global", "projected", "metre",
           "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 "
           "+units=m +no_defs"),
    4269: ("NAD83", "geographic", "degree",
           "+proj=longlat +datum=NAD83 +no_defs"),
    32633: ("WGS 84 / UTM zone 33N", "projected", "metre",
            "+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs"),
    # GRS80 conic/azimuthal families (closed-form Snyder kernels in
    # geom.make_albers/make_lcc2sp/make_laea; the datums are treated as
    # WGS84-equivalent, PROJ's own gridless default)
    5070: ("NAD83 / Conus Albers", "projected", "metre",
           "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
           "+x_0=0 +y_0=0 +datum=NAD83 +units=m +no_defs"),
    2154: ("RGF93 v1 / Lambert-93", "projected", "metre",
           "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 "
           "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m +no_defs"),
    3035: ("ETRS89-extended / LAEA Europe", "projected", "metre",
           "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
           "+ellps=GRS80 +units=m +no_defs"),
    3395: ("WGS 84 / World Mercator", "projected", "metre",
           "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +datum=WGS84 "
           "+units=m +no_defs"),
    3031: ("WGS 84 / Antarctic Polar Stereographic", "projected", "metre",
           "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
           "+datum=WGS84 +units=m +no_defs"),
    3413: ("WGS 84 / NSIDC Sea Ice Polar Stereographic North",
           "projected", "metre",
           "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
           "+datum=WGS84 +units=m +no_defs"),
}


def _ensure_utm(code: int) -> bool:
    """Populate WGS84 UTM codes on demand: EPSG:32601-32660 (north)
    and 32701-32760 (south) — the whole family the engine transforms
    closed-form (geom.to_utm/from_utm Krüger series)."""
    if code in _REGISTRY:
        return True
    if 32601 <= code <= 32660 or 32701 <= code <= 32760:
        zone = code % 100
        hemi = "N" if code < 32700 else "S"
        south = " +south" if hemi == "S" else ""
        _REGISTRY[code] = (
            f"WGS 84 / UTM zone {zone}{hemi}", "projected", "metre",
            f"+proj=utm +zone={zone}{south} +datum=WGS84 +units=m +no_defs")
        return True
    return False

_WKT_AUTH = re.compile(
    r'AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]\s*\]\s*$', re.IGNORECASE)
_WKT2_ID = re.compile(r'ID\s*\[\s*"EPSG"\s*,\s*(\d+)\s*\]\s*\]\s*$',
                      re.IGNORECASE)


class CRSError(ValueError):
    """Unrecognized CRS input (reference fiona.errors.CRSError)."""


class CRS:
    """Immutable EPSG-backed coordinate reference system descriptor."""

    __slots__ = ("_code", "_proj4")

    def __init__(self, code: int):
        code = int(code)
        if not _ensure_utm(code):
            raise CRSError(f"EPSG:{code} is not in the bundled registry")
        object.__setattr__(self, "_code", code)
        object.__setattr__(self, "_proj4", None)

    def __setattr__(self, *a):  # immutability, like the cdef class
        raise AttributeError("CRS objects are immutable")

    # -- constructors (crs.pyx:545-852) ----------------------------------

    @staticmethod
    def from_epsg(code: int) -> "CRS":
        if int(code) <= 0:
            raise CRSError("EPSG codes are positive integers")
        return CRS(int(code))

    @staticmethod
    def from_wkt(wkt: str) -> "CRS":
        # compound CRS: resolve to the horizontal member (reference
        # tests/test_compound_crs.py behavior)
        mc = re.match(r'\s*(COMPD_CS|COMPOUNDCRS)\s*[\[(]', wkt,
                      re.IGNORECASE)
        if mc:
            mh = re.search(r'\b(PROJCS|GEOGCS|PROJCRS|GEOGCRS)\s*[\[(]',
                           wkt, re.IGNORECASE)
            if mh:
                depth, i = 0, mh.end() - 1
                open_br, close_br = wkt[i], {"[": "]", "(": ")"}[wkt[i]]
                for j in range(i, len(wkt)):
                    if wkt[j] == open_br:
                        depth += 1
                    elif wkt[j] == close_br:
                        depth -= 1
                        if depth == 0:
                            return CRS.from_wkt(wkt[mh.start():j + 1])
            raise CRSError("compound WKT has no horizontal member")
        m = _WKT_AUTH.search(wkt.strip()) or _WKT2_ID.search(wkt.strip())
        if m:
            return CRS(int(m.group(1)))
        # name sniffing for authority-less WKT of registered systems —
        # only the ROOT node's name counts (a nested BASEGEOGCRS["WGS 84"]
        # must not resolve a projected CRS to 4326)
        mroot = re.match(r'\s*[A-Za-z_]+\s*[\[(]\s*"([^"]*)"', wkt)
        if mroot:
            for code, (name, _k, _u, _p) in _REGISTRY.items():
                if mroot.group(1) == name:
                    return CRS(code)
        # authority-less WKT1/WKT2: lower PROJECTION/METHOD + PARAMETER
        # nodes into the proj4 families the kernel library implements
        # (reference crs.pyx from_wkt round-trips these through PROJ)
        from .crs_wkt import wkt_to_proj4
        p4 = wkt_to_proj4(wkt)
        if p4 is not None:
            return CRS.from_string(p4)
        raise CRSError("WKT carries no EPSG authority this engine knows "
                       "and no projection method it implements")

    @staticmethod
    def from_string(value: str) -> "CRS":
        v = value.strip()
        if not v:
            raise CRSError("empty CRS string")
        if v.upper().startswith("EPSG:"):
            return CRS.from_epsg(int(v.split(":", 1)[1]))
        if v.startswith("+"):   # proj4
            d = _proj4_dict(v)
            if d.get("proj") == "utm" and "zone" in d:
                code = 32600 + int(d["zone"]) + (100 if "south" in d else 0)
                if _proj4_dict(CRS(code).to_proj4()) == d:
                    return CRS(code)
            for code, (_n, _k, _u, proj4) in _REGISTRY.items():
                if d == _proj4_dict(proj4):
                    return CRS(code)
            # any parameterization of an implemented kernel family is a
            # valid (codeless) CRS, like the reference's PROJ-backed
            # CRS(proj4) — to_epsg() returns None on these
            from . import geom as _geom
            if _geom.kernel_from_proj4(d) is not None:
                return CRS._from_params(v)
            raise CRSError(f"unrecognized proj4 string {v!r}")
        if "[" in v:            # WKT-ish
            return CRS.from_wkt(v)
        raise CRSError(f"unrecognized CRS string {value!r}")

    @staticmethod
    def _from_params(proj4: str) -> "CRS":
        """Codeless CRS backed by a proj4 parameter string (reference:
        `fiona/crs.pyx` CRSs built from PROJ params carry no authority
        and `to_epsg()` is None)."""
        self = object.__new__(CRS)
        object.__setattr__(self, "_code", None)
        object.__setattr__(self, "_proj4", " ".join(proj4.split()))
        return self

    @staticmethod
    def from_dict(data: dict) -> "CRS":
        if "init" in data:
            return CRS.from_string(str(data["init"]).upper())
        parts = " ".join(f"+{k}={v}" if v is not True else f"+{k}"
                         for k, v in data.items())
        return CRS.from_string(parts)

    @staticmethod
    def from_user_input(value) -> "CRS":
        if isinstance(value, CRS):
            return value
        if isinstance(value, int):
            return CRS.from_epsg(value)
        if isinstance(value, dict):
            return CRS.from_dict(value)
        if isinstance(value, str):
            return CRS.from_string(value)
        raise CRSError(f"cannot build a CRS from {value!r}")

    # -- accessors (crs.pyx:126-438) --------------------------------------

    @property
    def is_geographic(self) -> bool:
        if self._code is None:
            return self.to_dict().get("proj") == "longlat"
        return _REGISTRY[self._code][1] == "geographic"

    @property
    def is_projected(self) -> bool:
        return not self.is_geographic

    @property
    def is_valid(self) -> bool:
        return True

    @property
    def linear_units(self) -> str:
        if self._code is None:
            return "degree" if self.is_geographic else "metre"
        return _REGISTRY[self._code][2]

    @property
    def name(self) -> str:
        if self._code is None:
            # like PROJ's synthesized name for authority-less CRSs
            return f"unknown ({self.to_dict().get('proj', '?')})"
        return _REGISTRY[self._code][0]

    def to_epsg(self) -> int | None:
        # None for parameter-built CRSs, like the reference when PROJ
        # cannot identify an authority code (crs.pyx to_epsg)
        return self._code

    def to_authority(self) -> tuple[str, str] | None:
        if self._code is None:
            return None
        return ("EPSG", str(self._code))

    def to_dict(self) -> dict:
        return _proj4_dict(self.to_proj4())

    def to_proj4(self) -> str:
        if self._code is None:
            return self._proj4
        return _REGISTRY[self._code][3]

    def to_wkt(self) -> str:
        if self._code is None:
            # codeless CRS: emit real WKT1 PROJECTION/PARAMETER nodes
            # that from_wkt lowers back to the same kernel (reference
            # crs.pyx to_wkt round-trips via PROJ)
            from .crs_wkt import proj4_to_wkt
            w = proj4_to_wkt(self.to_dict(), name=self.name)
            if w is not None:
                return w
            name, kind, unit = self.name, "projected", "metre"
            if self.is_geographic:
                kind, unit = "geographic", "degree"
        else:
            name, kind, unit, _ = _REGISTRY[self._code]
        geog = ('GEOGCS["WGS 84",DATUM["WGS_1984",'
                'SPHEROID["WGS 84",6378137,298.257223563]],'
                'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]')
        auth = ("" if self._code is None
                else f',AUTHORITY["EPSG","{self._code}"]')
        if kind == "geographic":
            return f'{geog}{auth}]'
        return f'PROJCS["{name}",{geog}],UNIT["{unit}",1]{auth}]'

    # -- protocol ----------------------------------------------------------

    def __eq__(self, other) -> bool:
        try:
            o = CRS.from_user_input(other)
        except CRSError:
            return NotImplemented
        if self._code is not None and o._code is not None:
            return o._code == self._code
        return o.to_dict() == self.to_dict()

    def __hash__(self):
        if self._code is None:
            return hash(("CRS", frozenset(self.to_dict().items())))
        return hash(("CRS", self._code))

    def __repr__(self):
        if self._code is None:
            return f"CRS.from_string({self._proj4!r})"
        return f"CRS.from_epsg({self._code})"

    def __str__(self):
        if self._code is None:
            return self._proj4
        return f"EPSG:{self._code}"


def _proj4_dict(s: str) -> dict:
    out = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            out[k] = v
        elif tok:
            out[tok] = True
    return out


# table-property plumbing (the engine's layer metadata slot) -------------

CRS_PROPERTY = "fiona_spark.crs"


def attach_crs(props: dict, crs) -> dict:
    """Record a CRS in a table-properties dict (iceberg_like manifests /
    catalog tags) the way the reference stores crs_wkt per layer."""
    out = dict(props or {})
    out[CRS_PROPERTY] = str(CRS.from_user_input(crs))
    return out


def crs_of(props: dict) -> CRS | None:
    v = (props or {}).get(CRS_PROPERTY)
    return CRS.from_user_input(v) if v else None
