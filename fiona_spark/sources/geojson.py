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


#: engine geometry/envelope columns — never serialized as properties
_GEOM_COLS = ("geom_type", "rings_xs", "rings_ys", "xs", "ys",
              "xmin", "ymin", "xmax", "ymax")


def feature_struct(df: DataFrame, id_col: str = "id",
                   geom_type: str = "Polygon",
                   prop_cols: list[str] | None = None) -> DataFrame:
    """Assemble GeoJSON-shaped feature structs from ring columns.

    Geometry coordinates come from (xs, ys); properties from
    ``prop_cols`` (default: everything else).  Output column:
    ``feature`` struct mirroring `fiona/model.py:296-391` Feature.
    """
    skip = {id_col, *_GEOM_COLS}
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


def _feature_lines(df: DataFrame, id_col: str, geom_type: str) -> DataFrame:
    """One GeoJSON feature JSON string per row, column ``value``.

    Frames carrying the full ring model (``geom_type``/``rings_xs``/
    ``rings_ys``) serialize EXACTLY — per-row geometry type, holes,
    MultiPolygon part nesting rebuilt by ``model.geometry_from_rings``
    — via one distributed mapInPandas (Arrow-batched; GeoJSON text
    export is a slow-path format anyway).  Legacy (xs, ys)-only frames
    keep the all-JVM to_json path.
    """
    if "rings_xs" not in df.columns:
        feats = feature_struct(df, id_col, geom_type)
        return feats.select(F.to_json(F.col("feature")).alias("value"))

    cols = list(df.columns)
    idc = id_col if id_col in cols else ("fid" if "fid" in cols else None)

    def encode(batches):
        import json as _json

        import pandas as pd

        from ..model import ObjectEncoder, geometry_from_rings
        for pdf in batches:
            lines = []
            # to_dict("records"), never itertuples: namedtuples mangle
            # non-identifier property names positionally
            for rec in pdf.to_dict("records"):
                geometry = geometry_from_rings(
                    rec.get("geom_type") or geom_type,
                    rec["rings_xs"], rec["rings_ys"])
                props = {k: v for k, v in rec.items()
                         if k not in _GEOM_COLS and k != idc}
                feat = {"type": "Feature",
                        "id": rec.get(idc) if idc else None,
                        "geometry": geometry, "properties": props}
                lines.append(_json.dumps(feat, cls=ObjectEncoder))
            yield pd.DataFrame({"value": lines})

    return df.mapInPandas(encode, "value string")


def write_feature_seq(df: DataFrame, path: str, id_col: str = "id",
                      geom_type: str = "Polygon",
                      use_rs: bool = False, mode: str = "overwrite") -> None:
    """``fio cat`` sink: one GeoJSON feature per line (RS-optional).

    Distributed text write — one part file per partition, exactly like
    the reference's stream output but parallel.
    """
    line = F.col("value")
    if use_rs:
        line = F.concat(F.lit(RS), line)
    (_feature_lines(df, id_col, geom_type)
     .select(line.alias("value")).write.mode(mode).text(path))


def write_collection(df: DataFrame, path: str, id_col: str = "id",
                     geom_type: str = "Polygon") -> None:
    """``fio collect`` sink: ONE FeatureCollection JSON document.

    The reference streams into a single doc on one process
    (`fio/collect.py:92-113`); the distributed analogue is coalesce(1) —
    an explicitly driver-ish operation, only sane for result sets that
    fit one file (as in the reference).
    """
    feats = _feature_lines(df, id_col, geom_type).select(
        F.col("value").alias("j"))
    (feats.coalesce(1)
     .agg(F.concat(F.lit('{"type": "FeatureCollection", "features": ['),
                   F.concat_ws(", ", F.collect_list("j")),
                   F.lit("]}")).alias("value"))
     .write.mode("overwrite").text(path))


def read_feature_seq(spark, path: str) -> DataFrame:
    """``fio load`` source: newline/RS-delimited features -> rows.

    Schema inference from the FIRST feature (schema_of_json on one
    sampled line — exactly the reference's infer-from-first-feature,
    `fio/load.py:84-97`), then a JVM-side from_json over the cleaned
    text: no per-row Python anywhere on the read path (the r1 version
    round-tripped through raw.rdd.map, pickling every row)."""
    # RS-delimited streams may be PRETTY-PRINTED (one feature spans
    # many lines — the reference's sequence-pp.txt, RFC 8142): when the
    # stream carries RS markers, split on THEM, not on newlines.
    probe = spark.read.text(path).limit(50).collect()
    has_rs = any(RS in r["value"] for r in probe)
    if has_rs:
        raw = (spark.read.text(path, wholetext=True)
               .select(F.explode(F.split("value", RS)).alias("value"))
               .select(F.trim(F.col("value")).alias("value"))
               .filter(F.length("value") > 0))
    else:
        raw = spark.read.text(path).select(
            F.regexp_replace("value", RS, "").alias("value")).filter(
            F.length("value") > 0)
    first = raw.limit(1).collect()
    if not first:
        raise ValueError(f"no features found in {path}")
    schema = spark.range(1).select(
        F.schema_of_json(F.lit(first[0]["value"])).alias("s")
    ).collect()[0]["s"]
    js = raw.select(F.from_json("value", schema).alias("f")).select("f.*")
    return _features_to_rows(js)


def read_collection(spark, path: str) -> DataFrame:
    """Read a FeatureCollection document (``fio distrib`` equivalent:
    one row per feature)."""
    js = spark.read.option("multiLine", "true").json(path)
    if set(js.columns) == {"_corrupt_record"}:
        # an RS marker before the document (the reference's
        # collection-pp.txt) corrupts the multiLine parse: strip RS
        # from the whole text and re-parse via from_json
        clean = (spark.read.text(path, wholetext=True)
                 .select(F.regexp_replace("value", RS, "").alias("value")))
        doc = clean.limit(1).collect()[0]["value"]
        schema = spark.range(1).select(
            F.schema_of_json(F.lit(doc)).alias("s")).collect()[0]["s"]
        js = clean.select(F.from_json("value", schema).alias("d")
                          ).select("d.*")
    feats = js.select(F.explode("features").alias("f")).select("f.*")
    return _features_to_rows(feats)


def _features_to_rows(js: DataFrame) -> DataFrame:
    from pyspark.sql import types as T

    # The JSON-inferred type of geometry.coordinates depends on the
    # geometry kind actually present (Point: array<double>, LineString:
    # 2-deep, Polygon: 3-deep, MultiPolygon: 4-deep); a CASE across
    # depths would fail analysis, so branch on the inferred schema
    # (mirrors fio load's infer-from-first-feature, `fio/load.py:84-97`).
    coords_t = js.select(F.col("geometry.coordinates").alias("c")).schema[0].dataType
    depth = 0
    t = coords_t
    while isinstance(t, T.ArrayType):
        depth += 1
        t = t.elementType
    if depth >= 4:        # MultiPolygon: parts x rings -> flat ring list
        rx = F.expr("flatten(transform(geometry.coordinates, "
                    "part -> transform(part, ring -> transform(ring, c -> c[0]))))")
        ry = F.expr("flatten(transform(geometry.coordinates, "
                    "part -> transform(part, ring -> transform(ring, c -> c[1]))))")
    elif depth == 3:      # Polygon: shell + holes, all rings kept
        rx = F.expr("transform(geometry.coordinates, ring -> transform(ring, c -> c[0]))")
        ry = F.expr("transform(geometry.coordinates, ring -> transform(ring, c -> c[1]))")
    elif depth == 2:      # LineString / MultiPoint
        rx = F.expr("array(transform(geometry.coordinates, c -> c[0]))")
        ry = F.expr("array(transform(geometry.coordinates, c -> c[1]))")
    else:                 # Point
        rx = F.expr("array(array(CAST(geometry.coordinates[0] AS DOUBLE)))")
        ry = F.expr("array(array(CAST(geometry.coordinates[1] AS DOUBLE)))")
    from pyspark.sql import types as T2
    names = {f.name: f.dataType for f in js.schema.fields}
    sel = [F.col("id") if "id" in names
           else F.lit(None).cast("string").alias("id"),
           F.col("geometry.type").alias("geom_type"),
           rx.alias("rings_xs"), ry.alias("rings_ys")]
    # features without a properties object (reference rmnp.geojson) or
    # with null-typed properties have nothing to expand
    if isinstance(names.get("properties"), T2.StructType):
        sel.append(F.col("properties.*"))
    out = js.select(*sel)
    return (out
            # first ring kept as flat (xs, ys) for single-ring consumers
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
