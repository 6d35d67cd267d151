"""Schema type-system round-trip tests (ports the reference's schema
behaviors: tests/test_schema.py, fiona/schema.pyx normalization)."""

import pytest
from pyspark.sql import types as T

from fiona_spark import schema
from fiona_spark.errors import SchemaError

COUTWILDRNP_SCHEMA = {
    "geometry": "Polygon",
    "properties": {
        "PERIMETER": "float:24.15", "FEATURE2": "str:80", "NAME": "str:80",
        "FEATURE1": "str:80", "URL": "str:101", "AGBUR": "str:80",
        "AREA": "float:24.15", "STATE_FIPS": "str:80", "STATE": "str:80",
        "WILDRNP020": "int:10",
    },
}


def test_parse_width_precision():
    assert schema.parse_field_type("float:24.15") == ("float", 24, 15)
    assert schema.parse_field_type("str:101") == ("str", 101, None)
    assert schema.parse_field_type("str") == ("str", None, None)
    assert schema.parse_field_type("List[str]") == ("List[str]", None, None)


def test_int_width_normalization():
    # fiona/schema.pyx:108-113: int:9 -> int32, int:10 -> int64
    assert schema.parse_field_type("int:9")[0] == "int32"
    assert schema.parse_field_type("int:10")[0] == "int64"
    assert schema.parse_field_type("int")[0] == "int"


def test_unknown_type_raises():
    with pytest.raises(SchemaError):
        schema.parse_field_type("complex128")
    with pytest.raises(SchemaError):
        schema.parse_field_type(":::")


def test_coutwildrnp_schema_roundtrip():
    st = schema.to_spark_schema(COUTWILDRNP_SCHEMA)
    names = [f.name for f in st.fields]
    assert names[0] == "id"
    assert {"geom_type", "xs", "ys", "xmin", "ymin", "xmax", "ymax"} <= set(names)
    by = {f.name: f for f in st.fields}
    assert isinstance(by["PERIMETER"].dataType, T.DoubleType)
    assert by["PERIMETER"].metadata["fiona:width"] == 24
    assert by["PERIMETER"].metadata["fiona:precision"] == 15
    assert isinstance(by["WILDRNP020"].dataType, T.LongType)   # int:10 -> int64
    assert by["URL"].metadata["fiona:width"] == 101
    back = schema.from_spark_schema(st)
    assert back == COUTWILDRNP_SCHEMA


def test_all_field_types_map():
    spec = {"geometry": "Point",
            "properties": {"a": "int16", "b": "int32", "c": "bool",
                           "d": "int64", "e": "float", "f": "str:80",
                           "g": "bytes", "h": "List[str]", "i": "date",
                           "j": "time", "k": "datetime"}}
    st = schema.to_spark_schema(spec)
    by = {f.name: f.dataType for f in st.fields}
    assert isinstance(by["a"], T.ShortType)
    assert isinstance(by["b"], T.IntegerType)
    assert isinstance(by["c"], T.BooleanType)
    assert isinstance(by["d"], T.LongType)
    assert isinstance(by["e"], T.DoubleType)
    assert isinstance(by["g"], T.BinaryType)
    assert isinstance(by["h"], T.ArrayType)
    assert isinstance(by["i"], T.DateType)
    assert isinstance(by["j"], T.StringType)     # no TimeType in Spark
    assert isinstance(by["k"], T.TimestampType)


def test_validate_record_keys():
    props = COUTWILDRNP_SCHEMA["properties"]
    schema.validate_record_keys({"NAME": "x"}, props)
    with pytest.raises(SchemaError):
        schema.validate_record_keys({"NAME": "x", "BOGUS": 1}, props)


def test_geometry_none_schema():
    st = schema.to_spark_schema({"geometry": "None",
                                 "properties": {"a": "int32"}})
    assert [f.name for f in st.fields] == ["id", "a"]


# -- geometry-type schema validation (r4; tests/test_schema_geom.py) --------

def test_valid_geom_types_rules():
    from fiona_spark.errors import UnsupportedGeometryTypeError
    from fiona_spark.schema import ALL_GEOMETRY_TYPES, valid_geom_types
    assert valid_geom_types("Point") == {"Point"}
    assert valid_geom_types(("Point", "LineString")) == {"Point",
                                                         "LineString"}
    assert valid_geom_types("Unknown") == ALL_GEOMETRY_TYPES
    assert valid_geom_types("Any") == ALL_GEOMETRY_TYPES
    assert valid_geom_types("3D Point") == {"Point"}
    with pytest.raises(UnsupportedGeometryTypeError):
        valid_geom_types("Triangle!")
    # shapefile single/multi promotion, except points
    assert valid_geom_types("Polygon", driver="ESRI Shapefile") == \
        {"Polygon", "MultiPolygon"}
    assert valid_geom_types("Point", driver="ESRI Shapefile") == {"Point"}


def test_enforce_geometry_types_gate(spark):
    from fiona_spark.schema import enforce_geometry_types
    df = spark.createDataFrame(
        [("a", "Point"), ("b", "3D Point"), ("c", None)],
        "id string, geom_type string")
    ok = enforce_geometry_types(df, ("Point", "LineString"))
    assert ok.count() == 3                      # all pass, incl. null
    bad = df.unionByName(spark.createDataFrame(
        [("d", "Polygon")], "id string, geom_type string"))
    gated = enforce_geometry_types(bad, "Point")
    with pytest.raises(Exception, match="GeometryTypeValidationError"):
        gated.collect()
    # Unknown accepts everything with zero plan overhead
    assert enforce_geometry_types(bad, "Unknown") is bad
