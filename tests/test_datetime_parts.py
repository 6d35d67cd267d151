"""RFC3339 datetime functions + geometry parts dump/collect round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fiona_spark import fixtures
from fiona_spark.functions import datetime as fdt
from fiona_spark.operators import aggregates


def test_parse_datetime_offsets(spark):
    """tz-offset datetimes normalize to UTC (fiona/rfc3339.py:2-5,
    fiona/ogrext.pyx:533-547 convert-to-GMT-on-write)."""
    pdf = spark.createDataFrame(
        [("2020-01-01T12:30:00Z",),
         ("2020-01-01T14:30:00+02:00",),
         ("2020-01-01T07:30:00-05:00",),
         ("2020-01-01 12:30:00",)], "s string")
    out = pdf.select(fdt.parse_datetime("s").alias("t")).toPandas()
    assert out["t"].nunique() == 1           # all the same UTC instant
    assert str(out["t"].iloc[0]) == "2020-01-01 12:30:00"


def test_parse_datetime_microseconds(spark):
    pdf = spark.createDataFrame([("2020-06-01T01:02:03.456789Z",)], "s string")
    t = pdf.select(fdt.parse_datetime("s").alias("t")).first()["t"]
    assert t.microsecond == 456789


def test_format_roundtrip(spark):
    pdf = spark.createDataFrame([("2021-03-04T05:06:07.000008Z",)], "s string")
    out = pdf.select(fdt.format_rfc3339(
        fdt.parse_datetime("s")).alias("f")).first()["f"]
    assert out == "2021-03-04T05:06:07.000008Z"


def test_parse_time_offset(spark):
    pdf = spark.createDataFrame([("10:30:00+02:00",), ("08:30:00Z",)], "s string")
    out = [r["t"] for r in pdf.select(fdt.parse_time("s").alias("t")).collect()]
    assert out[0] == out[1] == "08:30:00.000000"


def test_collect_dump_roundtrip(spark):
    zones = spark.createDataFrame(fixtures.gen_zones_pdf(12),
                                  schema=fixtures.ZONES_SCHEMA)
    z = zones.withColumn("grp", F.col("WILDRNP020") % 3)
    coll = aggregates.collect_geometries(z, ["grp"])
    assert coll.count() == 3
    back = aggregates.dump_parts(coll, ["grp"])
    assert back.count() == 12
    # every original ring survives byte-identically (as a value set)
    orig = {tuple(r["xs"]) for r in z.select("xs").collect()}
    got = {tuple(r["xs"]) for r in back.select("xs").collect()}
    assert got == orig
