"""WKT1 / WKT2 CRS text -> proj4 parameter string.

The reference round-trips authority-less WKT through PROJ
(`fiona/crs.pyx` from_wkt/to_wkt); this engine instead lowers the WKT
node tree into the proj4 parameter families that
``geom.kernel_from_proj4`` already implements (longlat, utm/tmerc,
merc/webmerc, cea, aea, lcc, laea, polar stere), so a WKT string
without an AUTHORITY/ID node still builds a working transform kernel.

Both dialects are handled from one node tree:
  WKT1  PROJCS[..., GEOGCS[..., SPHEROID[n,a,rf]], PROJECTION[m],
            PARAMETER[k,v]..., UNIT[...]]
  WKT2  PROJCRS[..., BASEGEOGCRS[..., ELLIPSOID[n,a,rf]],
            CONVERSION[..., METHOD[m], PARAMETER[k,v]...], CS[...]]

Returns None (never raises) when the projection method is outside the
engine's closed forms, so callers can fall back to other resolutions.
"""

from __future__ import annotations

import re

__all__ = ["wkt_to_proj4", "proj4_to_wkt", "parse_wkt_node"]


# -- tokenizer / node tree --------------------------------------------------

class _Node:
    __slots__ = ("keyword", "values")

    def __init__(self, keyword, values):
        self.keyword = keyword.upper()
        self.values = values          # str | float | _Node items

    def children(self, keyword):
        kw = keyword.upper()
        return [v for v in self.values
                if isinstance(v, _Node) and v.keyword == kw]

    def child(self, *keywords):
        for kw in keywords:
            got = self.children(kw)
            if got:
                return got[0]
        return None

    def find(self, *keywords):
        """Depth-first search for the first node with any keyword."""
        kws = {k.upper() for k in keywords}
        stack = [self]
        while stack:
            node = stack.pop(0)
            if node.keyword in kws:
                return node
            stack.extend(v for v in node.values if isinstance(v, _Node))
        return None

    def strings(self):
        return [v for v in self.values if isinstance(v, str)]

    def numbers(self):
        return [v for v in self.values if isinstance(v, float)]


_TOKEN = re.compile(r'"([^"]*)"|([A-Za-z_][A-Za-z0-9_]*)|([-+0-9.eE]+)'
                    r'|([\[\](),])')


def parse_wkt_node(text: str) -> _Node:
    """Parse one WKT CRS string into a node tree.  Raises ValueError on
    malformed input.  Accepts both [] and () bracket styles."""
    tokens = []
    pos = 0
    for m in _TOKEN.finditer(text):
        if text[pos:m.start()].strip():
            raise ValueError(f"bad WKT at offset {pos}")
        pos = m.end()
        if m.group(1) is not None:
            tokens.append(("str", m.group(1)))
        elif m.group(2) is not None:
            tokens.append(("word", m.group(2)))
        elif m.group(3) is not None:
            tokens.append(("num", m.group(3)))
        else:
            tokens.append(("punct", m.group(4)))
    if text[pos:].strip():
        raise ValueError("trailing characters in WKT")

    idx = 0

    def parse_node():
        nonlocal idx
        kind, kw = tokens[idx]
        if kind != "word":
            raise ValueError(f"expected keyword, got {kw!r}")
        idx += 1
        kind, br = tokens[idx]
        if kind != "punct" or br not in "[(":
            raise ValueError(f"expected '[' after {kw}")
        closer = "]" if br == "[" else ")"
        idx += 1
        values = []
        while True:
            kind, tok = tokens[idx]
            if kind == "punct" and tok == closer:
                idx += 1
                return _Node(kw, values)
            if kind == "punct" and tok == ",":
                idx += 1
                continue
            if kind == "str":
                values.append(tok)
                idx += 1
            elif kind == "num":
                values.append(float(tok))
                idx += 1
            elif kind == "word":
                # lookahead: nested node vs bare enum word (e.g. "east",
                # "NORTH", axis directions in WKT2)
                if (idx + 1 < len(tokens)
                        and tokens[idx + 1][0] == "punct"
                        and tokens[idx + 1][1] in "[("):
                    values.append(parse_node())
                else:
                    values.append(tok)
                    idx += 1
            else:
                raise ValueError(f"unexpected token {tok!r}")

    node = parse_node()
    if idx != len(tokens):
        raise ValueError("multiple top-level WKT nodes")
    return node


# -- method / parameter name normalization ----------------------------------

def _canon(name: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", name.strip().lower()).strip("_")


# EPSG method names, ESRI WKT1 names, and common PROJ spellings -> family
_METHODS = {
    "transverse_mercator": "tmerc",
    "gauss_kruger": "tmerc",
    "mercator_1sp": "merc1",
    "mercator_variant_a": "merc1",
    "mercator_2sp": "merc2",
    "mercator_variant_b": "merc2",
    "mercator": "merc1",
    "popular_visualisation_pseudo_mercator": "webmerc",
    "popular_visualization_pseudo_mercator": "webmerc",
    "mercator_auxiliary_sphere": "webmerc",
    "pseudo_mercator": "webmerc",
    "albers_conic_equal_area": "aea",
    "albers_equal_area": "aea",
    "albers": "aea",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert_conic_conformal_2sp": "lcc",
    "lambert_conformal_conic": "lcc",
    "lambert_conformal_conic_1sp": "lcc1",
    "lambert_conic_conformal_1sp": "lcc1",
    "lambert_azimuthal_equal_area": "laea",
    "polar_stereographic": "stere",
    "polar_stereographic_variant_a": "stere",
    "polar_stereographic_variant_b": "stere",
    "stereographic_south_pole": "stere",
    "stereographic_north_pole": "stere",
    "cylindrical_equal_area": "cea",
    "lambert_cylindrical_equal_area": "cea",
    "lambert_cylindrical_equal_area_spherical": "cea",
}

# parameter name -> proj4 key (per-family adjustments applied after)
_PARAMS = {
    "latitude_of_origin": "lat_0",
    "latitude_of_natural_origin": "lat_0",
    "latitude_of_false_origin": "lat_0",
    "latitude_of_center": "lat_0",
    "latitude_of_centre": "lat_0",
    "latitude_of_projection_centre": "lat_0",
    "latitude_of_projection_center": "lat_0",
    "central_meridian": "lon_0",
    "longitude_of_natural_origin": "lon_0",
    "longitude_of_false_origin": "lon_0",
    "longitude_of_center": "lon_0",
    "longitude_of_centre": "lon_0",
    "longitude_of_origin": "lon_0",
    "longitude_of_projection_centre": "lon_0",
    "longitude_of_projection_center": "lon_0",
    "scale_factor": "k",
    "scale_factor_at_natural_origin": "k",
    "false_easting": "x_0",
    "easting_at_false_origin": "x_0",
    "easting_at_projection_centre": "x_0",
    "false_northing": "y_0",
    "northing_at_false_origin": "y_0",
    "northing_at_projection_centre": "y_0",
    "standard_parallel_1": "lat_1",
    "latitude_of_1st_standard_parallel": "lat_1",
    "standard_parallel_2": "lat_2",
    "latitude_of_2nd_standard_parallel": "lat_2",
    "latitude_of_standard_parallel": "lat_ts",
}


def _fmt(x: float) -> str:
    return repr(x) if x != int(x) else str(int(x))


def _ellipsoid_tokens(root: _Node) -> list[str] | None:
    ell = root.find("SPHEROID", "ELLIPSOID")
    if ell is None:
        return None
    nums = ell.numbers()
    if len(nums) < 2:
        return None
    a, rf = nums[0], nums[1]
    out = [f"+a={_fmt(a)}"]
    if rf:
        out.append(f"+rf={_fmt(rf)}")
    return out


def wkt_to_proj4(wkt: str) -> str | None:
    """Lower a WKT1/WKT2 CRS string to a proj4 parameter string for the
    kernel families this engine implements; None when the method (or the
    WKT itself) is outside them."""
    try:
        root = parse_wkt_node(wkt)
    except (ValueError, IndexError):
        return None

    if root.keyword in ("GEOGCS", "GEOGCRS", "GEOGRAPHICCRS"):
        # Preserve a non-WGS84 ellipsoid as +a/+rf (like the projected
        # branch below) instead of silently rebranding it WGS84.  The
        # longlat kernel itself stays the identity either way — this
        # engine performs NO datum shifts anywhere (closed-form kernels
        # w.r.t. the CRS's own ellipsoid) — but the lowered string must
        # not claim a datum the WKT didn't.
        ell = _ellipsoid_tokens(root)
        if ell is None or ell == ["+a=6378137", "+rf=298.257223563"]:
            return "+proj=longlat +datum=WGS84 +no_defs"
        return " ".join(["+proj=longlat"] + ell + ["+no_defs"])
    if root.keyword not in ("PROJCS", "PROJCRS", "PROJECTEDCRS"):
        return None

    # method: WKT1 PROJECTION["name"], WKT2 CONVERSION[..., METHOD["name"]]
    meth_node = root.find("METHOD") or root.find("PROJECTION")
    if meth_node is None or not meth_node.strings():
        return None
    fam = _METHODS.get(_canon(meth_node.strings()[0]))
    if fam is None:
        return None

    # parameters: search the whole tree (WKT1 keeps them as PROJCS
    # siblings, WKT2 nests them under CONVERSION)
    params: dict[str, float] = {}
    stack = [root]
    while stack:
        node = stack.pop(0)
        for v in node.values:
            if not isinstance(v, _Node):
                continue
            if v.keyword == "PARAMETER":
                names, nums = v.strings(), v.numbers()
                if names and nums:
                    key = _PARAMS.get(_canon(names[0]))
                    if key:
                        params[key] = nums[0]
            else:
                stack.append(v)

    def p(key, default=0.0):
        return params.get(key, default)

    toks = []
    if fam == "tmerc":
        toks = ["+proj=tmerc", f"+lat_0={_fmt(p('lat_0'))}",
                f"+lon_0={_fmt(p('lon_0'))}", f"+k={_fmt(p('k', 1.0))}"]
    elif fam == "merc1":
        toks = ["+proj=merc", f"+lon_0={_fmt(p('lon_0'))}",
                f"+k={_fmt(p('k', 1.0))}"]
    elif fam == "merc2":
        toks = ["+proj=merc", f"+lon_0={_fmt(p('lon_0'))}",
                f"+lat_ts={_fmt(p('lat_ts', p('lat_1')))}"]
    elif fam == "webmerc":
        # spherical formulas on the semi-major axis, like EPSG:3857
        return ("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 "
                f"+lon_0={_fmt(p('lon_0'))} +x_0={_fmt(p('x_0'))} "
                f"+y_0={_fmt(p('y_0'))} +k=1 +units=m +no_defs")
    elif fam == "aea":
        lat1 = p("lat_1", p("lat_0"))
        toks = ["+proj=aea", f"+lat_0={_fmt(p('lat_0'))}",
                f"+lon_0={_fmt(p('lon_0'))}", f"+lat_1={_fmt(lat1)}",
                f"+lat_2={_fmt(p('lat_2', lat1))}"]
    elif fam == "lcc":
        lat1 = p("lat_1", p("lat_0"))
        toks = ["+proj=lcc", f"+lat_0={_fmt(p('lat_0'))}",
                f"+lon_0={_fmt(p('lon_0'))}", f"+lat_1={_fmt(lat1)}",
                f"+lat_2={_fmt(p('lat_2', lat1))}"]
    elif fam == "lcc1":
        # engine LCC kernel requires k0 == 1 (kernel_from_proj4 gate);
        # 1SP with unit scale degenerates to 2SP with both parallels at
        # the origin latitude
        if p("k", 1.0) != 1.0:
            return None
        lat0 = p("lat_0")
        toks = ["+proj=lcc", f"+lat_0={_fmt(lat0)}",
                f"+lon_0={_fmt(p('lon_0'))}", f"+lat_1={_fmt(lat0)}",
                f"+lat_2={_fmt(lat0)}"]
    elif fam == "laea":
        toks = ["+proj=laea", f"+lat_0={_fmt(p('lat_0'))}",
                f"+lon_0={_fmt(p('lon_0'))}"]
    elif fam == "cea":
        toks = ["+proj=cea", f"+lat_ts={_fmt(p('lat_ts', p('lat_1')))}",
                f"+lon_0={_fmt(p('lon_0'))}"]
    elif fam == "stere":
        # WKT1 Polar_Stereographic carries latitude_of_origin as the
        # TRUE-SCALE parallel with scale_factor 1 (EPSG variant B); the
        # pole is implied by its sign.  Variant A puts +/-90 in lat_0
        # with an explicit scale_factor.
        # ESRI also spells the true-scale parallel Standard_Parallel_1
        lat0 = p("lat_0")
        lat_ts = params.get("lat_ts", params.get("lat_1"))
        if abs(lat0) >= 90.0 - 1e-9:        # variant A
            if p("k", 1.0) != 1.0 and lat_ts is None:
                return None
            pole = lat0
            if lat_ts is None:
                lat_ts = lat0
        else:                                # variant B spelling
            if lat_ts is None:
                lat_ts = lat0
            pole = 90.0 if lat_ts >= 0 else -90.0
        toks = ["+proj=stere", f"+lat_0={_fmt(pole)}",
                f"+lat_ts={_fmt(lat_ts)}", f"+lon_0={_fmt(p('lon_0'))}"]
    else:                                    # pragma: no cover
        return None

    ell = _ellipsoid_tokens(root)
    if ell is None:
        ell = ["+datum=WGS84"]
    toks += [f"+x_0={_fmt(p('x_0'))}", f"+y_0={_fmt(p('y_0'))}"]
    toks += ell + ["+units=m", "+no_defs"]
    return " ".join(toks)


# -- the inverse: proj4 params -> WKT1 text (reference crs.pyx to_wkt) -------

# family -> (WKT1 PROJECTION name, [(proj4 key, WKT1 PARAMETER name)])
_EMIT = {
    "tmerc": ("Transverse_Mercator",
              [("lat_0", "Latitude_Of_Origin"),
               ("lon_0", "Central_Meridian"), ("k", "Scale_Factor")]),
    "merc": ("Mercator_1SP",
             [("lon_0", "Central_Meridian"), ("k", "Scale_Factor")]),
    "merc2": ("Mercator_2SP",
              [("lon_0", "Central_Meridian"),
               ("lat_ts", "Standard_Parallel_1")]),
    "cea": ("Cylindrical_Equal_Area",
            [("lon_0", "Central_Meridian"),
             ("lat_ts", "Standard_Parallel_1")]),
    "aea": ("Albers_Conic_Equal_Area",
            [("lat_0", "Latitude_Of_Origin"), ("lon_0", "Central_Meridian"),
             ("lat_1", "Standard_Parallel_1"),
             ("lat_2", "Standard_Parallel_2")]),
    "lcc": ("Lambert_Conformal_Conic_2SP",
            [("lat_0", "Latitude_Of_Origin"), ("lon_0", "Central_Meridian"),
             ("lat_1", "Standard_Parallel_1"),
             ("lat_2", "Standard_Parallel_2")]),
    "laea": ("Lambert_Azimuthal_Equal_Area",
             [("lat_0", "Latitude_Of_Origin"),
              ("lon_0", "Central_Meridian")]),
    "stere": ("Polar_Stereographic",
              [("lat_ts", "Standard_Parallel_1"),
               ("lon_0", "Central_Meridian")]),
}


def _geogcs(a: float, rf: float) -> str:
    return ('GEOGCS["GCS_unnamed",DATUM["D_unnamed",'
            f'SPHEROID["unnamed",{a!r},{rf!r}]],'
            'PRIMEM["Greenwich",0.0],'
            'UNIT["Degree",0.0174532925199433]]')


def proj4_to_wkt(d: dict, name: str = "unnamed") -> str | None:
    """proj4 param dict -> WKT1 text whose PROJECTION/PARAMETER nodes
    :func:`wkt_to_proj4` lowers back to the SAME kernel — the engine's
    analogue of the reference's PROJ-backed ``to_wkt`` for
    authority-less CRSs.  None when the family has no WKT1 spelling
    here (callers keep their generic fallback)."""
    from . import geom as _geom
    proj = d.get("proj")
    ell = _geom._proj4_ellipsoid(d)
    if ell is None:
        return None
    a, f = ell
    rf = 1.0 / f if f else 0.0
    if proj == "longlat":
        return _geogcs(a, rf)
    fam = proj
    if proj == "utm" and "zone" in d:
        zone = int(d["zone"])
        d = {"lat_0": 0.0, "lon_0": _geom.utm_zone_lon0(zone),
             "k": 0.9996, "x_0": 500000.0,
             "y_0": 10000000.0 if "south" in d else 0.0}
        fam = "tmerc"
    elif proj in ("etmerc",):
        fam = "tmerc"
    elif proj == "webmerc":
        # spherical Mercator_1SP on the semi-major axis (EPSG:3857 form)
        d = dict(d, k=1.0)
        a, rf = a, 0.0
        fam = "merc"
    elif proj == "merc" and "lat_ts" in d:
        fam = "merc2"
    if fam not in _EMIT:
        return None
    meth, params = _EMIT[fam]

    def g(key, default=0.0):
        v = d.get(key, d.get("k_0", 1.0) if key == "k" else default)
        return float(v)

    parts = []
    for key, pname in params:
        default = 1.0 if key == "k" else 0.0
        parts.append(f'PARAMETER["{pname}",{g(key, default)!r}]')
    if fam == "stere":
        # variant-B spelling: the true-scale parallel carries the pole
        # sign (wkt_to_proj4 reconstructs lat_0 = +/-90 from it); a
        # pole-tangent +proj=stere without lat_ts is scale-1 AT the pole
        lat_ts = float(d.get("lat_ts", d.get("lat_0", 90.0)))
        parts[0] = f'PARAMETER["Standard_Parallel_1",{lat_ts!r}]'
    parts.append(f'PARAMETER["False_Easting",{g("x_0")!r}]')
    parts.append(f'PARAMETER["False_Northing",{g("y_0")!r}]')
    return (f'PROJCS["{name}",{_geogcs(a, rf)},'
            f'PROJECTION["{meth}"],' + ",".join(parts)
            + ',UNIT["Meter",1.0]]')
