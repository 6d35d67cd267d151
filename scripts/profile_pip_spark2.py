#!/usr/bin/env python
"""In-UDF per-batch timing of the fused PIP kernel under Spark.

Writes one line per batch to /tmp/pipprof/<pid>.txt:
    t_enter t_after_tonumpy t_after_probe t_after_kernel t_exit n_rows n_cand
Aggregate afterwards to see where executor wall time goes (compute vs
gaps between batches = Arrow feed / scheduling).
"""
from __future__ import annotations

import os
import sys
import time
import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

SF = float(os.environ.get("PROF_SF", "1.0"))


def main():
    from pyspark.sql import functions as F, types as T
    from fiona_spark import fixtures
    from fiona_spark.operators import spatial
    from fiona_spark.session import get_spark

    os.makedirs("/tmp/pipprof", exist_ok=True)
    for f in glob.glob("/tmp/pipprof/*.txt"):
        os.remove(f)

    spark = get_spark(cores=32, app="profile-pip2")
    sc = spark.sparkContext
    img_path = fixtures.images_path(spark, SF)
    zone_path = fixtures.zones_path(spark, SF)

    spark.range(1000).select(F.sum("id")).collect()
    _warm = F.pandas_udf(lambda v: v * 1.0, "double")
    (spark.range(32 * 1000).repartition(32)
     .select(F.sum(_warm(F.col("id").cast("double")))).collect())

    zones = spark.read.parquet(zone_path)
    prep = spatial._zone_prep(zones, ("zone_id",), None,
                              row_guard=spatial.MAX_BROADCAST_ZONES)
    (zpdf, res, cov_ridx, cov_cell, edge_offs, ex0, ey0, ex1, ey1,
     feat_wrap) = prep
    order = np.argsort(cov_cell, kind="stable")
    bc = sc.broadcast((cov_cell[order], cov_ridx[order], edge_offs,
                       ex0, ey0, ex1, ey1, feat_wrap))

    @F.pandas_udf(T.LongType())
    def cntk(px: pd.Series, py: pd.Series) -> pd.Series:
        from fiona_spark import cells, geom
        te = time.time()
        (cell_sorted, zidx_sorted, eo, x0, y0, x1, y1, fw) = bc.value
        pxv = px.to_numpy(np.float64)
        pyv = py.to_numpy(np.float64)
        t1 = time.time()
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
        t2 = time.time()
        hit = geom.points_in_edges_packed(rx, ry, zi, eo, x0, y0, x1, y1)
        t3 = time.time()
        out = pd.Series(np.bincount(row[hit], minlength=n))
        t4 = time.time()
        with open(f"/tmp/pipprof/{os.getpid()}.txt", "a") as fh:
            fh.write(f"{te:.4f} {t1-te:.4f} {t2-t1:.4f} {t3-t2:.4f} "
                     f"{t4-t3:.4f} {n} {total}\n")
        return out

    pts = spark.read.parquet(img_path).select("image_id", "lng", "lat")
    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    for i in range(2):
        t0 = time.perf_counter()
        noop(pts.withColumn("m", cntk("lng", "lat")))
        print(f"B_cnt[{i}]: {time.perf_counter()-t0:.3f}s", flush=True)
    spark.stop()

    # aggregate
    rows = []
    for f in glob.glob("/tmp/pipprof/*.txt"):
        pid = os.path.basename(f)[:-4]
        for ln in open(f):
            p = ln.split()
            rows.append((pid, float(p[0]), *map(float, p[1:5]),
                         int(p[5]), int(p[6])))
    rows.sort(key=lambda r: r[1])
    tot_batches = len(rows)
    n_workers = len(set(r[0] for r in rows))
    span = rows[-1][1] + sum(rows[-1][2:6]) - rows[0][1]
    sums = [sum(r[i] for r in rows) for i in (2, 3, 4, 5)]
    print(f"batches={tot_batches} workers={n_workers} span={span:.1f}s")
    print(f"sum bc+tonumpy={sums[0]:.1f}s probe+gather={sums[1]:.1f}s "
          f"kernel={sums[2]:.1f}s bincount={sums[3]:.1f}s")
    busy = sum(sums)
    print(f"total in-udf busy={busy:.1f}s -> {busy/n_workers:.1f}s/worker; "
          f"idle/worker={span - busy/n_workers:.1f}s")
    ker = sorted(r[4] for r in rows)
    print(f"kernel per batch: min={ker[0]:.3f} med={ker[len(ker)//2]:.3f} "
          f"max={ker[-1]:.3f}")
    nb = sorted(r[6] for r in rows)
    print(f"cand per batch: min={nb[0]} med={nb[len(nb)//2]} max={nb[-1]}")
    sz = sorted(r[5] for r in rows)
    print(f"rows per batch: min={sz[0]} med={sz[len(sz)//2]} max={sz[-1]}")


if __name__ == "__main__":
    main()
