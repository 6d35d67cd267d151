#!/usr/bin/env python
"""Local (no-Spark) profiling of the fused PIP UDF body at a given SF.

Loads the zone fixture parquet directly with pyarrow, reproduces
_zone_prep's numpy work, then times each stage of the _pip_fused_udf
batch body on synthetic point batches drawn like the image fixture.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

from fiona_spark import cells, geom
from fiona_spark.operators.spatial import _res_from_stats

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

zdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".fixtures", f"zones_sf{SF}.parquet")
t0 = time.perf_counter()
tbl = pq.read_table(zdir, columns=["zone_id", "xs", "ys",
                                   "xmin", "ymin", "xmax", "ymax"])
print(f"read zones: {time.perf_counter()-t0:.3f}s rows={tbl.num_rows}")

t0 = time.perf_counter()
zpdf = tbl.to_pandas()
print(f"to_pandas: {time.perf_counter()-t0:.3f}s")

xminv = zpdf["xmin"].to_numpy(np.float64)
yminv = zpdf["ymin"].to_numpy(np.float64)
xmaxv = zpdf["xmax"].to_numpy(np.float64)
ymaxv = zpdf["ymax"].to_numpy(np.float64)
w = float(np.mean(xmaxv - xminv))
h = float(np.mean(ymaxv - yminv))
res = _res_from_stats(len(zpdf), w, h)
print(f"res={res} mean_w={w:.2f} mean_h={h:.2f}")

t0 = time.perf_counter()
cov_ridx, cov_cell = cells.cells_covering_flat(xminv, yminv, xmaxv, ymaxv, res)
print(f"covering: {time.perf_counter()-t0:.3f}s rows={len(cov_cell)}")

t0 = time.perf_counter()
rings_xs = [[v] for v in zpdf["xs"].tolist()]
rings_ys = [[v] for v in zpdf["ys"].tolist()]
print(f"ringlists: {time.perf_counter()-t0:.3f}s")
t0 = time.perf_counter()
edge_offs, ex0, ey0, ex1, ey1 = geom.pack_feature_edges(rings_xs, rings_ys)
print(f"pack_edges: {time.perf_counter()-t0:.3f}s edges={len(ex0)}")

t0 = time.perf_counter()
order = np.argsort(cov_cell, kind="stable")
cell_sorted, zidx_sorted = cov_cell[order], cov_ridx[order]
print(f"sort cov: {time.perf_counter()-t0:.3f}s")

t0 = time.perf_counter()
import pickle
blob = pickle.dumps((cell_sorted, zidx_sorted, edge_offs, ex0, ey0, ex1, ey1,
                     np.zeros(len(zpdf), bool)))
print(f"pickle broadcast: {time.perf_counter()-t0:.3f}s bytes={len(blob)/1e6:.1f}MB")
t0 = time.perf_counter()
pickle.loads(blob)
print(f"unpickle broadcast: {time.perf_counter()-t0:.3f}s")

# synthetic point batch, image-fixture-like
PHI = 137.50776405003785
PHI2 = 73.17234262469423
i = np.arange(BATCH, dtype=np.float64)
lng = -180.0 + (i * PHI) % 360.0
lat = -60.0 + (i * PHI2) % 120.0
hot = (np.arange(BATCH) % 20) == 0
lng[hot] = 10.0 + (i[hot] * PHI) % 1.0
lat[hot] = 45.0 + (i[hot] * PHI2) % 1.0

feat_wrap = np.zeros(len(zpdf), dtype=bool)
nonempty = edge_offs[:-1] < edge_offs[1:]
seg = edge_offs[:-1][nonempty]
fmax = np.maximum.reduceat(ex0, seg)
fmin = np.minimum.reduceat(ex0, seg)
feat_wrap[nonempty] = (fmax > 180.0) | (fmin < -180.0)


def batch_body(pxv, pyv, reps=3):
    stages = {}
    for _ in range(reps):
        t0 = time.perf_counter()
        pcell = cells.cell_id(pxv, pyv, res)
        lo = np.searchsorted(cell_sorted, pcell, "left")
        hi = np.searchsorted(cell_sorted, pcell, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        stages.setdefault("probe", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        n = len(pxv)
        row = np.repeat(np.arange(n, dtype=np.int64), cnt)
        starts = np.cumsum(cnt) - cnt
        pos = lo[row] + (np.arange(total, dtype=np.int64) - starts[row])
        zi = zidx_sorted[pos]
        rx, ry = pxv[row], pyv[row]
        stages.setdefault("gather_cand", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        hit = geom.points_in_edges_packed(rx, ry, zi, edge_offs,
                                          ex0, ey0, ex1, ey1)
        stages.setdefault("raycast", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        pend = np.flatnonzero(feat_wrap[zi] & ~hit)
        for shift in (360.0, -360.0):
            if not len(pend):
                break
            h2 = geom.points_in_edges_packed(rx[pend] + shift, ry[pend],
                                             zi[pend], edge_offs,
                                             ex0, ey0, ex1, ey1)
            hit[pend] |= h2
            pend = pend[~h2]
        stages.setdefault("wrap_retest", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        out_cnt = np.bincount(row[hit], minlength=n)
        parts = np.split(zi[hit], np.cumsum(out_cnt)[:-1])
        stages.setdefault("split_out", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        import pandas as pd
        s = pd.Series(parts)
        stages.setdefault("to_series", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        import pyarrow as pa
        pa.Array.from_pandas(s, type=pa.list_(pa.int64()))
        stages.setdefault("to_arrow", []).append(time.perf_counter() - t0)
    return total, int(hit.sum()), stages


total, nhit, stages = batch_body(lng, lat)
print(f"batch={BATCH} candidates={total} ({total/BATCH:.1f}/pt) "
      f"hits={nhit} ({nhit/BATCH:.2f}/pt)")
wrapn = int(feat_wrap.sum())
print(f"wrap features: {wrapn}")
for k, v in stages.items():
    print(f"  {k}: min {min(v)*1000:.1f}ms  (x{len(v)})")
per_pt = sum(min(v) for v in stages.values()) / BATCH
print(f"kernel total/pt: {per_pt*1e6:.2f}us -> est {per_pt*SF*1e6/32:.1f}s "
      f"wall at sf{SF} on 32 cores")
