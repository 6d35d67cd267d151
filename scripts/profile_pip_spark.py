#!/usr/bin/env python
"""Isolate where the fused PIP pass spends time on Spark at sf1.0.

Variants over the same 1M-point scan, all noop-sinked:
  A. stub     — UDF accesses bc.value, returns empty arrays (no kernel)
  B. cnt      — full kernel, returns per-point HIT COUNT (no list col)
  C. arr      — full kernel, returns list<int64> (the shipped shape)
  D. arr+expl — C plus explode + count (the full query tail)
Each prints its own wall; run twice for cold/steady.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

SF = float(os.environ.get("PROF_SF", "1.0"))


def main():
    from pyspark.sql import functions as F, types as T
    from fiona_spark import fixtures, cells, geom
    from fiona_spark.operators import spatial
    from fiona_spark.session import get_spark

    spark = get_spark(cores=32, app="profile-pip")
    sc = spark.sparkContext
    img_path = fixtures.images_path(spark, SF)
    zone_path = fixtures.zones_path(spark, SF)
    images = lambda: spark.read.parquet(img_path)
    zones = lambda: spark.read.parquet(zone_path)

    spark.range(1000).select(F.sum("id")).collect()
    _warm = F.pandas_udf(lambda v: v * 1.0, "double")
    (spark.range(32 * 1000).repartition(32)
     .select(F.sum(_warm(F.col("id").cast("double")))).collect())

    prep = spatial._zone_prep(zones(), ("zone_id",), None,
                              row_guard=spatial.MAX_BROADCAST_ZONES)
    (zpdf, res, cov_ridx, cov_cell, edge_offs, ex0, ey0, ex1, ey1,
     feat_wrap) = prep
    order = np.argsort(cov_cell, kind="stable")
    bc = sc.broadcast((cov_cell[order], cov_ridx[order], edge_offs,
                       ex0, ey0, ex1, ey1, feat_wrap))

    pts = images().select("image_id", "lng", "lat")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def stub(px: pd.Series, py: pd.Series) -> pd.Series:
        _ = bc.value
        return pd.Series([[]] * len(px))

    @F.pandas_udf(T.LongType())
    def cntk(px: pd.Series, py: pd.Series) -> pd.Series:
        (cell_sorted, zidx_sorted, eo, x0, y0, x1, y1, fw) = bc.value
        pxv = px.to_numpy(np.float64)
        pyv = py.to_numpy(np.float64)
        n = len(pxv)
        if n == 0:
            return pd.Series([], dtype=np.int64)
        pcell = cells.cell_id(pxv, pyv, res)
        lo = np.searchsorted(cell_sorted, pcell, "left")
        hi = np.searchsorted(cell_sorted, pcell, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        row = np.repeat(np.arange(n, dtype=np.int64), cnt)
        starts = np.cumsum(cnt) - cnt
        pos = lo[row] + (np.arange(total, dtype=np.int64) - starts[row])
        zi = zidx_sorted[pos]
        rx, ry = pxv[row], pyv[row]
        hit = geom.points_in_edges_packed(rx, ry, zi, eo, x0, y0, x1, y1)
        return pd.Series(np.bincount(row[hit], minlength=n))

    full = spatial._pip_fused_udf(bc, res)

    def t(name, fn):
        for i in range(2):
            sc.setJobDescription(f"{name}/{i}")
            t0 = time.perf_counter()
            fn()
            print(f"{name}[{i}]: {time.perf_counter()-t0:.3f}s", flush=True)
        sc.setJobDescription(None)

    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    t("A_stub", lambda: noop(pts.withColumn("m", stub("lng", "lat"))))
    t("B_cnt", lambda: noop(pts.withColumn("m", cntk("lng", "lat"))))
    t("C_arr", lambda: noop(pts.withColumn("m", full("lng", "lat"))))
    t("D_arr_explode", lambda: pts.withColumn(
        "_zidx", F.explode(full("lng", "lat"))).count())
    spark.stop()


if __name__ == "__main__":
    main()
