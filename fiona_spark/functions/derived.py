"""Shared Spark/DuckDB derivations for oracle-checked queries.

The driver's correctness gate compares Spark output to DuckDB output on
the same parquet tables.  Spatial queries need point/zone geometry, so
we derive it from existing TPC-H columns with integer-modular
arithmetic + one IEEE division — expression trees that evaluate
bit-identically in Spark SQL, the DataFrame API, and DuckDB.  The same
SQL strings are used verbatim on both sides (F.expr here, CTE text in
the oracle), so any value mismatch is an engine bug, not float noise.

Rules for every expression in this module:
 * integer ops (*, %, +) then at most one division by a power of ten
 * no transcendental functions (sin/log are libm-implementation-defined)
 * squared terms written as x*x, never pow(x, 2)
"""

from __future__ import annotations

# --- points derived from orders (15k rows at sf0.01) -----------------------

# NOTE: all constants in exponent notation — `100.0` parses as
# DECIMAL(4,1) in Spark SQL but the expression result is DOUBLE in
# DuckDB; `1e2` is DOUBLE in both, keeping the arithmetic bit-identical.
PT_LNG = "(((o_orderkey * 7919) % 36000) / 1e2 - 180e0)"
PT_LAT = "(((o_orderkey * 104729) % 18000) / 1e2 - 90e0)"
PT_HALF_W = "(((o_orderkey % 9) + 1) * 5e-2)"
PT_HALF_H = "(((o_orderkey % 5) + 1) * 5e-2)"

PTS_CTE = f"""
  SELECT image_id, lng, lat,
         lng - half_w AS xmin, lat - half_h AS ymin,
         lng + half_w AS xmax, lat + half_h AS ymax
  FROM (
    SELECT o_orderkey AS image_id,
           {PT_LNG} AS lng, {PT_LAT} AS lat,
           {PT_HALF_W} AS half_w, {PT_HALF_H} AS half_h
    FROM orders)
"""

# --- rectangular zones derived from nation (25 rows) ------------------------

ZN_CLNG = "(((n_nationkey * 13931) % 30000) / 1e2 - 150e0)"
ZN_CLAT = "(((n_nationkey * 7129) % 14000) / 1e2 - 70e0)"
ZN_HALF_W = "(((n_nationkey % 7) + 1) * 2e0)"
ZN_HALF_H = "(((n_nationkey % 5) + 1) * 15e-1)"

ZONES_CTE = f"""
  SELECT zone_key, clng, clat,
         clng - half_w AS xmin, clat - half_h AS ymin,
         clng + half_w AS xmax, clat + half_h AS ymax
  FROM (
    SELECT CAST(n_nationkey AS BIGINT) AS zone_key,
           {ZN_CLNG} AS clng, {ZN_CLAT} AS clat,
           {ZN_HALF_W} AS half_w, {ZN_HALF_H} AS half_h
    FROM nation)
"""


def pts_df(spark, sf_dir: str):
    """The derived point table as a DataFrame (same values as PTS_CTE)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (orders
            .selectExpr("o_orderkey AS image_id",
                        f"{PT_LNG} AS lng", f"{PT_LAT} AS lat",
                        f"{PT_HALF_W} AS half_w", f"{PT_HALF_H} AS half_h")
            .selectExpr("image_id", "lng", "lat",
                        "lng - half_w AS xmin", "lat - half_h AS ymin",
                        "lng + half_w AS xmax", "lat + half_h AS ymax"))


def zones_rect_df(spark, sf_dir: str):
    """The derived rectangular zone table (same values as ZONES_CTE).

    Includes a polygon-ring form (xs, ys) of each rectangle so the
    generic polygon operators (PIP join etc.) run unmodified on it.
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rect = (nation
            .selectExpr("CAST(n_nationkey AS BIGINT) AS zone_key",
                        f"{ZN_CLNG} AS clng", f"{ZN_CLAT} AS clat",
                        f"{ZN_HALF_W} AS half_w", f"{ZN_HALF_H} AS half_h")
            .selectExpr("zone_key", "clng", "clat",
                        "clng - half_w AS xmin", "clat - half_h AS ymin",
                        "clng + half_w AS xmax", "clat + half_h AS ymax"))
    return rect.selectExpr(
        "*",
        "array(xmin, xmax, xmax, xmin) AS xs",
        "array(ymin, ymin, ymax, ymax) AS ys")
