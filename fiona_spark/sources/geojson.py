"""GeoJSON source/sink with the reference CLI's stream semantics.

Maps Fiona's three GeoJSON shapes onto DataFrames:

  * ``fio cat``    — RS/LF-delimited feature sequence out
    (`fiona/fio/cat.py:63-139`, RS emit `:133-136`)
  * ``fio collect``— one FeatureCollection document
    (`fiona/fio/collect.py:48-245`)
  * ``fio load``   — feature stream in, schema inferred from the first
    feature (`fiona/fio/load.py:36-114`, inference `:84-97`)
  * ``fio distrib``— FeatureCollection -> feature rows, stamping
    ``parent`` metadata (`fiona/fio/distrib.py:16-35`)

A feature row carries ``id``, geometry ring columns (xs, ys + envelope),
and one column per property (SURVEY.md section 1.1 mapping).  The JSON
codec is Spark's native to_json/from_json (JVM, codegen); nothing is
parsed per row in Python.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

RS = "\x1e"   # ASCII record separator, as in fio --rs output


def feature_struct(df: DataFrame, id_col: str = "id",
                   geom_type: str = "Polygon",
                   prop_cols: list[str] | None = None) -> DataFrame:
    """Assemble GeoJSON-shaped feature structs from ring columns.

    Geometry coordinates come from (xs, ys); properties from
    ``prop_cols`` (default: everything else).  Output column:
    ``feature`` struct mirroring `fiona/model.py:296-391` Feature.
    """
    skip = {id_col, "xs", "ys", "xmin", "ymin", "xmax", "ymax"}
    props = prop_cols or [c for c in df.columns if c not in skip]
    coords = F.expr("transform(xs, (x, i) -> array(x, ys[i]))")
    if geom_type == "Polygon":
        coords = F.array(coords)   # one outer ring
    return df.withColumn("feature", F.struct(
        F.lit("Feature").alias("type"),
        F.col(id_col).cast("string").alias("id"),
        F.struct(F.lit(geom_type).alias("type"),
                 coords.alias("coordinates")).alias("geometry"),
        F.struct(*[F.col(c).alias(c) for c in props]).alias("properties")))


def write_feature_seq(df: DataFrame, path: str, id_col: str = "id",
                      geom_type: str = "Polygon",
                      use_rs: bool = False) -> None:
    """``fio cat`` sink: one GeoJSON feature per line (RS-optional).

    Distributed text write — one part file per partition, exactly like
    the reference's stream output but parallel.
    """
    feats = feature_struct(df, id_col, geom_type)
    line = F.to_json(F.col("feature"))
    if use_rs:
        line = F.concat(F.lit(RS), line)
    feats.select(line.alias("value")).write.mode("overwrite").text(path)


def write_collection(df: DataFrame, path: str, id_col: str = "id",
                     geom_type: str = "Polygon") -> None:
    """``fio collect`` sink: ONE FeatureCollection JSON document.

    The reference streams into a single doc on one process
    (`fio/collect.py:92-113`); the distributed analogue is coalesce(1) —
    an explicitly driver-ish operation, only sane for result sets that
    fit one file (as in the reference).
    """
    feats = feature_struct(df, id_col, geom_type).select(
        F.to_json("feature").alias("j"))
    (feats.coalesce(1)
     .agg(F.concat(F.lit('{"type": "FeatureCollection", "features": ['),
                   F.concat_ws(", ", F.collect_list("j")),
                   F.lit("]}")).alias("value"))
     .write.mode("overwrite").text(path))


def read_feature_seq(spark, path: str) -> DataFrame:
    """``fio load`` source: newline/RS-delimited features -> rows.

    Schema inference from the data (spark.read.json ~ the reference's
    first-feature inference, `fio/load.py:84-97`).  Ring columns are
    rebuilt from the first polygon ring / point coords.
    """
    raw = spark.read.text(path).select(
        F.regexp_replace("value", RS, "").alias("value")).filter(
        F.length("value") > 0)
    js = spark.read.json(raw.rdd.map(lambda r: r.value))
    return _features_to_rows(js)


def read_collection(spark, path: str) -> DataFrame:
    """Read a FeatureCollection document (``fio distrib`` equivalent:
    one row per feature)."""
    js = spark.read.option("multiLine", "true").json(path)
    feats = js.select(F.explode("features").alias("f")).select("f.*")
    return _features_to_rows(feats)


def _features_to_rows(js: DataFrame) -> DataFrame:
    from pyspark.sql import types as T

    # The JSON-inferred type of geometry.coordinates depends on the
    # geometry kind actually present (Point: array<double>, Polygon:
    # array<array<double>>); a CASE across both would fail analysis, so
    # branch on the inferred schema (mirrors fio load's infer-from-first
    # -feature, `fiona/fio/load.py:84-97`).
    coords_t = js.select(F.col("geometry.coordinates").alias("c")).schema[0].dataType
    nested = isinstance(coords_t, T.ArrayType) and \
        isinstance(coords_t.elementType, T.ArrayType)
    if nested:
        xs = F.expr("transform(geometry.coordinates[0], c -> c[0])")
        ys = F.expr("transform(geometry.coordinates[0], c -> c[1])")
    else:
        xs = F.expr("array(CAST(geometry.coordinates[0] AS DOUBLE))")
        ys = F.expr("array(CAST(geometry.coordinates[1] AS DOUBLE))")
    out = js.select(
        F.col("id"),
        F.col("geometry.type").alias("geom_type"),
        xs.alias("xs"), ys.alias("ys"),
        F.col("properties.*"))
    return (out
            .withColumn("xmin", F.array_min("xs"))
            .withColumn("ymin", F.array_min("ys"))
            .withColumn("xmax", F.array_max("xs"))
            .withColumn("ymax", F.array_max("ys")))
