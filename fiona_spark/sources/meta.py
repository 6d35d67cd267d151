"""Driver capability / option introspection — the engine analogue of
``fiona/meta.py`` (dataset/layer creation options, dataset open
options, extensions, VSI support, supported field types per driver —
reference surface `fiona/meta.py:60-271`, backed there by GDAL's
DMD_*/DCAP_* metadata items).

Spark-side, a driver's "creation options" are the writer options its
``DataFrameWriter`` accepts and "open options" the reader options; the
VSI analogue is Hadoop-FS URI support (every Spark format reads any
``scheme://`` the cluster's filesystems resolve — the design note the
r2 verdict recorded for zip/cloud sources).  Field-type capability is
the Spark-SQL type surface the format can round-trip: parquet/json
carry nested types, csv/text only atomics (the same shape as the
reference's per-driver ``field_types`` gating in
`fiona/schema.pyx` + `drvsupport._driver_field_type_unsupported`).

Same error contract as :mod:`.drivers`: unknown driver ->
``DriverError``.
"""

from __future__ import annotations

from ..errors import DriverError
from .drivers import _EXT_TO_DRIVER, _REGISTRY

# drawn from schema.FIELD_TYPES_MAP so capability strings parse with
# schema.parse_field_type
_ATOMIC = ["bool", "date", "datetime", "float", "float32", "float64",
           "int", "int16", "int32", "int64", "json", "str", "time"]
_NESTED = _ATOMIC + ["List[str]", "bytes"]

# option catalogs: name -> {type, default, description[, values]} —
# the dict-of-dicts shape fiona.meta._parse_options produces
_META: dict[str, dict] = {
    "parquet": {
        "open": {
            "mergeSchema": {"type": "boolean", "default": "false",
                            "description": "merge part-file schemas"},
            "datetimeRebaseMode": {"type": "string-select",
                                   "values": ["EXCEPTION", "CORRECTED",
                                              "LEGACY"],
                                   "default": "EXCEPTION",
                                   "description": "pre-Gregorian rebase"},
        },
        "creation": {
            "compression": {"type": "string-select",
                            "values": ["none", "snappy", "gzip", "zstd",
                                       "lz4"],
                            "default": "snappy",
                            "description": "page compression codec"},
            "maxRecordsPerFile": {"type": "int", "default": "0",
                                  "description": "file split bound"},
        },
        "field_types": _NESTED,
    },
    "orc": {
        "open": {
            "mergeSchema": {"type": "boolean", "default": "false",
                            "description": "merge part-file schemas"},
        },
        "creation": {
            "compression": {"type": "string-select",
                            "values": ["none", "snappy", "zlib", "lzo",
                                       "zstd", "lz4"],
                            "default": "zstd",
                            "description": "stripe compression codec"},
        },
        "field_types": _NESTED,
    },
    "csv": {
        "open": {
            "header": {"type": "boolean", "default": "true",
                       "description": "first line is the header"},
            "sep": {"type": "string", "default": ",",
                    "description": "field delimiter"},
            "encoding": {"type": "string", "default": "UTF-8",
                         "description": "charset; auto-falls back to "
                                        "ISO-8859-1 (detect_encoding)"},
            "inferSchema": {"type": "boolean", "default": "true",
                            "description": "type inference pass"},
        },
        "creation": {
            "header": {"type": "boolean", "default": "true",
                       "description": "write the header line"},
            "sep": {"type": "string", "default": ",",
                    "description": "field delimiter"},
            "compression": {"type": "string-select",
                            "values": ["none", "gzip", "bzip2"],
                            "default": "none",
                            "description": "whole-file codec"},
        },
        "field_types": _ATOMIC,
    },
    "json": {
        "open": {
            "encoding": {"type": "string", "default": "UTF-8",
                         "description": "charset (auto-detected)"},
            "multiLine": {"type": "boolean", "default": "false",
                          "description": "one record spans lines"},
        },
        "creation": {
            "compression": {"type": "string-select",
                            "values": ["none", "gzip"],
                            "default": "none",
                            "description": "whole-file codec"},
        },
        "field_types": _NESTED,
    },
    "text": {
        "open": {
            "wholetext": {"type": "boolean", "default": "false",
                          "description": "one row per file"},
            "lineSep": {"type": "string", "default": "\\n",
                        "description": "line delimiter"},
        },
        "creation": {
            "lineSep": {"type": "string", "default": "\\n",
                        "description": "line delimiter"},
        },
        "field_types": ["str"],
    },
    "kml": {
        "open": {},
        "creation": {},
        "field_types": ["str", "float", "int"],
    },
    "gml": {
        "open": {},
        "creation": {},
        "field_types": _ATOMIC,
    },
    "gpx": {
        "open": {
            "layer": {"type": "string-select",
                      "values": ["waypoints", "tracks", "track_points",
                                 "routes", "route_points"],
                      "default": "waypoints",
                      "description": "GPX layer to open"},
        },
        "creation": {},
        "field_types": ["str", "float", "int", "datetime"],
    },
    "shapefile": {
        "open": {
            "encoding": {"type": "string", "default": "auto",
                         "description": "dbf charset; UTF-8 probe with "
                                        "ISO-8859-1 fallback"},
        },
        "creation": {
            "encoding": {"type": "string", "default": "utf-8",
                         "description": "dbf charset"},
        },
        "field_types": ["bool", "date", "float", "int", "str"],
    },
    "flatgeobuf": {
        "open": {
            "bbox": {"type": "string", "default": "None",
                     "description": "(xmin, ymin, xmax, ymax) pushdown; "
                                    "uses the packed Hilbert R-tree "
                                    "when the file carries one"},
        },
        "creation": {
            "name": {"type": "string", "default": "layer",
                     "description": "header layer name"},
            "geometry_type": {"type": "string", "default": "Unknown",
                              "description": "header geometry type "
                                             "(per-feature when Unknown)"},
            "index_node_size": {"type": "int", "default": "0",
                                "description": "packed Hilbert R-tree "
                                               "node size; 0 = no index "
                                               "(indexed writes Hilbert-"
                                               "reorder features)"},
        },
        "field_types": ["bool", "bytes", "float", "int", "str"],
    },
    "openfilegdb": {
        "open": {
            "layer": {"type": "string", "default": "first user layer",
                      "description": "GDB_SystemCatalog table name"},
        },
        "creation": {},
        "field_types": ["bool", "bytes", "datetime", "float", "int", "str"],
    },
    "geopackage": {
        "open": {
            "layer": {"type": "string", "default": "first",
                      "description": "feature table to open"},
            "bbox": {"type": "string", "default": "None",
                     "description": "(xmin, ymin, xmax, ymax) pushdown; "
                                    "pruned inside SQLite via the "
                                    "gpkg_rtree_index extension when "
                                    "present"},
        },
        "creation": {
            "spatial_index": {"type": "boolean", "default": "false",
                              "description": "maintain the spec's "
                                             "gpkg_rtree_index extension"},
        },
        "field_types": _ATOMIC + ["bytes"],
    },
    "esrijson": {
        "open": {},
        "creation": {},
        "field_types": _ATOMIC,
    },
    "bna": {
        "open": {},
        "creation": {},
        "field_types": ["str"],
    },
    "gmt": {
        "open": {},
        "creation": {},
        "field_types": ["str", "float", "int"],
    },
    "arcgen": {
        "open": {},
        "creation": {},
        "field_types": [],
    },
    "mapinfo": {
        "open": {},
        "creation": {
            "delimiter": {"type": "string", "default": ",",
                          "description": "MID field delimiter"},
        },
        "field_types": ["bool", "date", "float", "int", "str"],
    },
    "sqlite": {
        "open": {
            "layer": {"type": "string", "default": "first",
                      "description": "feature table to open"},
        },
        "creation": {
            "srid": {"type": "int", "default": "4326",
                     "description": "geometry_columns srid"},
        },
        "field_types": _ATOMIC + ["bytes"],
    },
    "dxf": {
        "open": {},
        "creation": {},
        "field_types": ["str"],
    },
    "topojson": {
        "open": {},
        "creation": {},
        "field_types": _ATOMIC + ["json"],
    },
    "geojson": {
        "open": {},
        "creation": {
            "indent": {"type": "int", "default": "None",
                       "description": "pretty-print indent"},
        },
        "field_types": _ATOMIC + ["List[str]"],
    },
    "geojson_seq": {
        "open": {},
        "creation": {
            "rs": {"type": "boolean", "default": "false",
                   "description": "RFC 8142 RS-delimited sequence"},
        },
        "field_types": _ATOMIC + ["List[str]"],
    },
}


def _check(driver: str) -> dict:
    if driver not in _REGISTRY:
        raise DriverError(f"unsupported driver: {driver!r}")
    return _META.get(driver, {"open": {}, "creation": {},
                              "field_types": []})


def dataset_creation_options(driver: str) -> dict:
    """Writer options for ``driver`` (fiona.meta.dataset_creation_options)."""
    return dict(_check(driver)["creation"])


def layer_creation_options(driver: str) -> dict:
    """Spark datasets are single-layer: layer == dataset creation
    options (fiona.meta.layer_creation_options returns the
    DS_LAYER_CREATIONOPTIONLIST; here the two catalogs coincide)."""
    return dict(_check(driver)["creation"])


def dataset_open_options(driver: str) -> dict:
    """Reader options for ``driver`` (fiona.meta.dataset_open_options)."""
    return dict(_check(driver)["open"])


def extensions(driver: str) -> list[str]:
    """All path extensions inferring this driver
    (fiona.meta.extensions; empty list when none map)."""
    _check(driver)
    return sorted(e.lstrip(".") for e, d in _EXT_TO_DRIVER.items()
                  if d == driver)


def extension(driver: str) -> str | None:
    """The canonical extension (fiona.meta.extension: the first)."""
    exts = extensions(driver)
    return exts[0] if exts else None


def supports_vsi(driver: str) -> bool:
    """Hadoop-FS URI support — the engine's virtual-IO analogue
    (fiona.meta.supports_vsi / DCAP_VIRTUALIO); every Spark-native
    format reads any filesystem the cluster resolves."""
    _check(driver)
    return True


def supported_field_types(driver: str) -> list[str]:
    """Schema type-strings (``fiona_spark.schema`` vocabulary) the
    format round-trips (fiona.meta.supported_field_types)."""
    return list(_check(driver)["field_types"])


def print_driver_options(driver: str) -> str:
    """Human-readable option dump (fiona.meta.print_driver_options
    prints; here returns the text so callers/tests can capture it)."""
    out = []
    for title, cat in (("Dataset open options", dataset_open_options(driver)),
                       ("Creation options", dataset_creation_options(driver))):
        out.append(f"{title}:")
        if not cat:
            out.append("  (none)")
        for name, spec in sorted(cat.items()):
            desc = spec.get("description", "")
            dflt = spec.get("default")
            vals = spec.get("values")
            line = f"  {name} ({spec.get('type', '?')}): {desc}"
            if vals:
                line += f" [{'/'.join(vals)}]"
            if dflt is not None:
                line += f" (default {dflt})"
            out.append(line)
    return "\n".join(out)


def driver_metadata(driver: str) -> dict:
    """One record per driver for ``info()``-style surfaces: modes +
    extensions + option catalogs + type capability."""
    meta = _check(driver)
    return {
        "driver": driver,
        "modes": _REGISTRY[driver][2],
        "extensions": extensions(driver),
        "supports_vsi": supports_vsi(driver),
        "open_options": dict(meta["open"]),
        "creation_options": dict(meta["creation"]),
        "field_types": list(meta["field_types"]),
    }
