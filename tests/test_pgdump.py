"""PGDump (PostgreSQL SQL dump) sink (`fiona/drvsupport.py:113`
commented row — GDAL's write-only psql-script driver)."""

import struct

import pytest

from fiona_spark import wkb
from fiona_spark.errors import DriverError
from fiona_spark.sources.pgdump import write_pgdump


def _copy_rows(sql: str):
    lines = sql.splitlines()
    i = next(k for k, l in enumerate(lines) if l.startswith("COPY "))
    j = lines.index("\\.", i)
    return lines[i], [l.split("\t") for l in lines[i + 1:j]]


def _decode_ewkb(hexstr: str):
    data = bytes.fromhex(hexstr)
    code = struct.unpack_from("<I", data, 1)[0]
    assert code & 0x20000000, "SRID flag must be set"
    srid = struct.unpack_from("<I", data, 5)[0]
    plain = data[:1] + struct.pack("<I", code & ~0x20000000) + data[9:]
    return srid, wkb.decode(plain)


def test_pgdump_polygon_roundtrip_and_script_shape(spark, tmp_path):
    df = spark.createDataFrame(
        [("Polygon", [[0.0, 4.0, 4.0, 0.0]], [[0.0, 0.0, 3.0, 0.0]],
          "Alpha zone", 7, 2.5),
         ("Polygon", [[10.0, 11.0, 10.5]], [[10.0, 10.0, 11.0]],
          "tab\there", None, None)],
        schema="geom_type string, rings_xs array<array<double>>, "
               "rings_ys array<array<double>>, name string, n bigint, "
               "score double")
    p = str(tmp_path / "zones.sql")
    write_pgdump(df, p, srid=4326)
    sql = open(p).read()
    assert 'CREATE TABLE "public"."zones"' in sql
    assert "SELECT AddGeometryColumn('public','zones','wkb_geometry'," \
        "4326,'POLYGON',2);" in sql
    assert 'ADD COLUMN "name" VARCHAR;' in sql
    assert 'ADD COLUMN "n" INT8;' in sql
    assert 'ADD COLUMN "score" FLOAT8;' in sql
    assert "USING GIST" in sql
    assert sql.rstrip().endswith("COMMIT;")
    header, rows = _copy_rows(sql)
    assert '"wkb_geometry"' in header and '"name"' in header
    assert len(rows) == 2
    by_name = {r[1]: r for r in rows}
    srid, g = _decode_ewkb(by_name["Alpha zone"][0])
    assert srid == 4326 and g["type"] == "Polygon"
    xs = [c[0] for c in g["coordinates"][0]]
    assert xs[:4] == [0.0, 4.0, 4.0, 0.0]       # bit-exact doubles
    assert by_name["Alpha zone"][2] == "7"
    # COPY escaping: tab escaped, NULLs as \N
    assert "tab\\there" in by_name and by_name["tab\\there"][2] == "\\N"


def test_pgdump_point_and_types(spark, tmp_path):
    df = spark.createDataFrame(
        [("Point", [[1.5]], [[-2.5]], True, bytearray(b"\x01\xff"),
          ["a", "b", 'he said "hi, {pal}" \\ bye'])],
        schema="geom_type string, rings_xs array<array<double>>, "
               "rings_ys array<array<double>>, flag boolean, "
               "payload binary, tags array<string>")
    p = str(tmp_path / "pts.sql")
    write_pgdump(df, p, layer="mypts", srid=3857, spatial_index=False)
    sql = open(p).read()
    assert "'mypts','wkb_geometry',3857,'POINT',2" in sql
    assert "USING GIST" not in sql
    assert 'ADD COLUMN "flag" BOOLEAN;' in sql
    assert 'ADD COLUMN "payload" BYTEA;' in sql
    assert 'ADD COLUMN "tags" VARCHAR[];' in sql
    _h, rows = _copy_rows(sql)
    srid, g = _decode_ewkb(rows[0][0])
    assert srid == 3857
    assert g["coordinates"][:2] == [1.5, -2.5]
    assert rows[0][1] == "t"
    assert rows[0][2] == "\\\\x01ff"
    # elements are double-quoted per the Postgres array-literal rules
    # (r8: a comma/quote/brace/backslash inside an element must not split
    # or corrupt the literal), with COPY escaping applied on top
    assert rows[0][3] == ('{"a","b","he said \\\\"hi, {pal}\\\\" '
                          '\\\\\\\\ bye"}')


def test_pgdump_attribute_only_and_registry(spark, tmp_path):
    from fiona_spark.sources.drivers import (
        check_mode, driver_from_extension, supported_drivers,
        write_dataset)
    assert supported_drivers()["pgdump"] == "w"
    assert driver_from_extension("/tmp/x.sql") == "pgdump"
    with pytest.raises(DriverError):
        check_mode("pgdump", "r")
    df = spark.createDataFrame([(1, "a")], schema="id bigint, v string")
    p = str(tmp_path / "t.sql")
    write_dataset(df, p)
    sql = open(p).read()
    assert "AddGeometryColumn" not in sql
    _h, rows = _copy_rows(sql)
    assert rows == [["1", "a"]]


def test_pgdump_rejects_unmappable_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"k": "v"})], schema="id bigint, m map<string,string>")
    with pytest.raises(DriverError):
        write_pgdump(df, str(tmp_path / "bad.sql"))
