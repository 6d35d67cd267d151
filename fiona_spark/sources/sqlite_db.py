"""OGR-style SQLite source + sink — reference parity for the SQLite
row (`fiona/drvsupport.py:129` ``("SQLite", "raw")``).

GDAL's SQLite driver (non-SpatiaLite flavor) stores features in plain
SQLite tables: an ``OGC_FID INTEGER PRIMARY KEY``, a ``GEOMETRY`` blob
column holding standard WKB, property columns with SQLite affinities,
and a ``geometry_columns`` registry table
(``f_table_name / f_geometry_column / geometry_type /
coord_dimension / srid / geometry_format``) with
``geometry_format = 'WKB'``.  That layout is what this module reads
and writes — the geometry payload goes through the engine's own WKB
codec (`fiona_spark/wkb.py`), so round trips are bit-exact.

Read path: layer rows fetch on the driver (one SQLite file has no
splittable framing), geometry DECODE runs distributed via one
``mapInPandas`` over the blob column — the r4 single-file-format
convention (see README module notes).  Writer/appender stream
``toLocalIterator``.

Modes: r / w / a ("raw", matching the reference row).

THROUGHPUT CEILING: one SQLite file = driver-serial encode; bulk
exports belong in parquet/iceberg_like.
"""

from __future__ import annotations

import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..errors import DriverError

_GEOM_COLS = ("geom_type", "rings_xs", "rings_ys", "xs", "ys",
              "xmin", "ymin", "xmax", "ymax")

_OGR_GEOM_CODE = {"Point": 1, "LineString": 2, "Polygon": 3,
                  "MultiPoint": 4, "MultiLineString": 5,
                  "MultiPolygon": 6}

_SQLITE_T = {"string": "VARCHAR", "bigint": "INTEGER", "int": "INTEGER",
             "smallint": "INTEGER", "tinyint": "INTEGER",
             "boolean": "INTEGER", "double": "FLOAT", "float": "FLOAT",
             "binary": "BLOB", "date": "VARCHAR",
             "timestamp": "VARCHAR"}


def listlayers_sqlite(path: str) -> list[str]:
    with sqlite3.connect(path) as con:
        has = con.execute("SELECT name FROM sqlite_master WHERE "
                          "name = 'geometry_columns'").fetchone()
        if not has:
            return []
        return [r[0] for r in con.execute(
            "SELECT f_table_name FROM geometry_columns").fetchall()]


def read_sqlite(spark, path: str, layer: str | None = None) -> DataFrame:
    """Open one layer of an OGR-style SQLite DB as a ring-model frame."""
    layers = listlayers_sqlite(path)
    if not layers:
        raise DriverError(f"no feature layers in {path!r} "
                          "(no geometry_columns registry)")
    if layer is None:
        layer = layers[0]
    if layer not in layers:
        raise DriverError(f"no such layer {layer!r} (have {layers})")
    with sqlite3.connect(path) as con:
        gc = con.execute(
            "SELECT f_geometry_column FROM geometry_columns "
            "WHERE f_table_name = ?", (layer,)).fetchone()
        geom_col = gc[0]
        cur = con.execute(f'SELECT * FROM "{layer}"')
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    pdf = pd.DataFrame(rows, columns=cols)
    pdf[geom_col] = pdf[geom_col].map(
        lambda b: bytes(b) if b is not None else None)
    src = spark.createDataFrame(pdf).withColumnRenamed(geom_col,
                                                       "sq0blob")
    out_schema = (", ".join(
        f"`{c}` {f.dataType.simpleString()}"
        for c, f in zip(src.schema.names, src.schema.fields)
        if c != "sq0blob")
        + ", geom_type string, rings_xs array<array<double>>, "
          "rings_ys array<array<double>>")

    def run(batches):
        from .. import model, wkb
        for b in batches:
            recs = []
            for d in b.to_dict("records"):
                blob = d.pop("sq0blob")
                if blob is None:
                    d.update(geom_type=None, rings_xs=None,
                             rings_ys=None)
                else:
                    g = wkb.decode(blob)
                    t, rxs, rys = model.rings_from_geometry(g)
                    d.update(geom_type=t, rings_xs=rxs, rings_ys=rys)
                recs.append(d)
            yield pd.DataFrame(recs)

    out = src.mapInPandas(run, out_schema)
    return (out
            .withColumn("xs", F.expr("rings_xs[0]"))
            .withColumn("ys", F.expr("rings_ys[0]"))
            .withColumn("xmin", F.array_min(F.expr(
                "transform(rings_xs, r -> array_min(r))")))
            .withColumn("ymin", F.array_min(F.expr(
                "transform(rings_ys, r -> array_min(r))")))
            .withColumn("xmax", F.array_max(F.expr(
                "transform(rings_xs, r -> array_max(r))")))
            .withColumn("ymax", F.array_max(F.expr(
                "transform(rings_ys, r -> array_max(r))"))))


def write_sqlite(df: DataFrame, path: str, layer: str = "features",
                 mode: str = "w", srid: int = 4326) -> None:
    """OGR-layout SQLite sink; ``mode='a'`` appends to an existing
    layer (property columns must already exist)."""
    from .. import model, wkb

    props = [f for f in df.schema.fields
             if f.name not in _GEOM_COLS and f.name != "fid"]
    gt_rows = (df.select("geom_type").filter(
        F.col("geom_type").isNotNull()).limit(1).collect())
    gcode = _OGR_GEOM_CODE.get(gt_rows[0][0], 0) if gt_rows else 0
    con = sqlite3.connect(path)
    try:
        if mode == "w":
            con.execute("""CREATE TABLE IF NOT EXISTS geometry_columns (
                f_table_name VARCHAR, f_geometry_column VARCHAR,
                geometry_type INTEGER, coord_dimension INTEGER,
                srid INTEGER, geometry_format VARCHAR)""")
            cols = ", ".join(
                f'"{f.name}" '
                f'{_SQLITE_T.get(f.dataType.simpleString(), "VARCHAR")}'
                for f in props)
            con.execute(f'DROP TABLE IF EXISTS "{layer}"')
            con.execute(
                f'CREATE TABLE "{layer}" (OGC_FID INTEGER PRIMARY KEY '
                f'AUTOINCREMENT, GEOMETRY BLOB'
                f'{", " + cols if cols else ""})')
            con.execute("DELETE FROM geometry_columns "
                        "WHERE f_table_name = ?", (layer,))
            con.execute("INSERT INTO geometry_columns VALUES "
                        "(?, 'GEOMETRY', ?, 2, ?, 'WKB')",
                        (layer, gcode, srid))
        elif mode == "a":
            have = con.execute(
                "SELECT name FROM sqlite_master WHERE name = ?",
                (layer,)).fetchone()
            if not have:
                raise DriverError(f"append target layer {layer!r} "
                                  f"does not exist in {path!r}")
        else:
            raise DriverError(f"unsupported mode {mode!r}")
        names = [f.name for f in props]
        ph = ", ".join(["?"] * (len(names) + 1))
        collist = ", ".join(["GEOMETRY"] + [f'"{n}"' for n in names])
        insert = f'INSERT INTO "{layer}" ({collist}) VALUES ({ph})'
        cols_set = set(df.columns)
        for row in df.toLocalIterator():
            d = row.asDict(recursive=True)
            if d.get("rings_xs") is not None:
                g = model.geometry_from_rings(
                    d.get("geom_type") or "Polygon",
                    d["rings_xs"], d["rings_ys"])
            elif "xs" in cols_set and d.get("xs") is not None:
                g = model.geometry_from_rings(
                    d.get("geom_type") or "Polygon",
                    [d["xs"]], [d["ys"]])
            else:
                g = None
            blob = wkb.encode(dict(g)) if g is not None else None
            con.execute(insert, [blob] + [d.get(n) for n in names])
        con.commit()
    finally:
        con.close()
