"""Driver-side coordinate / geometry reprojection — public-API parity
with `fiona/transform.py:11-124` (`transform`, `transform_geom`).

The reference's functions run on plain Python sequences through PROJ;
these run the engine's closed-form numpy kernels (the same `pair_fn`
resolution the Spark UDFs in `functions.geometry` use), so driver code
and executor code share one transform implementation.  CRS inputs
accept anything `CRS.from_user_input` does: 'EPSG:4326', proj4 strings,
proj4 dicts, WKT, or CRS objects.

For DataFrame columns use `functions.geometry.transform_udf` /
`transform_geom_udf` — this module is for feature-at-a-time driver
logic (CLI helpers, tests, small fix-ups), like the reference's.
"""

from __future__ import annotations

import numpy as np

from . import geom as _geom
from . import model
from .crs import CRS


def _resolve(crs_like) -> str:
    if isinstance(crs_like, str) and crs_like.upper().startswith("EPSG:"):
        return f"EPSG:{int(crs_like.split(':', 1)[1])}"
    c = CRS.from_user_input(crs_like)
    code = c.to_epsg()
    # codeless (parameter-built) CRSs resolve by their proj4 string —
    # pair_fn builds the kernel directly from the parameters
    return f"EPSG:{code}" if code is not None else c.to_proj4()


def transform(src_crs, dst_crs, xs, ys):
    """Transform coordinate sequences between two CRSs
    (`fiona/transform.py:11-78`).  Returns (xp, yp) lists of float."""
    from .functions.geometry import pair_fn
    fn = pair_fn(_resolve(src_crs), _resolve(dst_crs))
    ox, oy = fn(np.asarray(xs, np.float64), np.asarray(ys, np.float64))
    return [float(v) for v in np.atleast_1d(ox)], \
        [float(v) for v in np.atleast_1d(oy)]


def transform_geom(src_crs, dst_crs, geometry, antimeridian_cutting=False,
                   antimeridian_offset=10.0, precision=-1):
    """Transform a GeoJSON-like geometry (or a list of them) between
    CRSs (`fiona/transform.py:80-124`; cutting + precision semantics
    from `fiona/_transform.pyx:131-183`).

    With ``antimeridian_cutting`` and a geographic destination, rings
    that land across +/-180 are WRAPDATELINE-cut; a split Polygon /
    LineString is promoted to its Multi* type, like OGR does.
    """
    if isinstance(geometry, (list, tuple)):
        return [transform_geom(src_crs, dst_crs, g, antimeridian_cutting,
                               antimeridian_offset, precision)
                for g in geometry]
    from .functions.geometry import pair_fn
    src, dst = _resolve(src_crs), _resolve(dst_crs)
    fn = pair_fn(src, dst)
    gtype, rxs, rys = model.rings_from_geometry(geometry)
    if gtype == "GeometryCollection":
        g = model.decode_object(geometry)
        members = [transform_geom(src_crs, dst_crs, m, antimeridian_cutting,
                                  antimeridian_offset, precision)
                   for m in (g.get("geometries") or [])]
        return model.Geometry(type=gtype, geometries=members)
    if not rxs:                                   # EMPTY passes through
        return model.decode_object(geometry)
    txs, tys = [], []
    for rx, ry in zip(rxs, rys):
        ox, oy = fn(np.asarray(rx, np.float64), np.asarray(ry, np.float64))
        txs.append(np.atleast_1d(ox))
        tys.append(np.atleast_1d(oy))
    if antimeridian_cutting and dst == "EPSG:4326" \
            and gtype not in ("Point", "MultiPoint"):
        n_in = len(txs)
        txs, tys, _ = _geom.cut_dateline_rings(txs, tys,
                                               antimeridian_offset)
        if len(txs) > n_in:
            gtype = {"Polygon": "MultiPolygon",
                     "LineString": "MultiLineString"}.get(gtype, gtype)
    if precision >= 0:
        txs = [np.round(v, precision) for v in txs]
        tys = [np.round(v, precision) for v in tys]
    return model.geometry_from_rings(
        gtype, [v.tolist() for v in txs], [v.tolist() for v in tys])
