"""Mirror of the driver's correctness gate: every queries() entry vs its
oracle_sql() in DuckDB, order-insensitive value comparison, at sf0.001
(driver runs sf0.01; same data shapes)."""

import math
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    return _duck()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(ORACLES[name])
    dcols = [c for c in res.columns]
    drows = res.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), \
        f"{name}: column sets differ: {scols} vs {dcols}"
    a = _norm_rows([c.lower() for c in scols], srows)
    b = _norm_rows([c.lower() for c in dcols], drows)
    assert len(a) == len(b), f"{name}: row counts {len(a)} vs {len(b)}"
    if a != b:
        diff_a = [r for r in a if r not in set(map(tuple, b))][:5]
        diff_b = [r for r in b if r not in set(map(tuple, a))][:5]
        pytest.fail(f"{name}: values differ; spark-only={diff_a} duck-only={diff_b}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
