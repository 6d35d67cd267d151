#!/usr/bin/env python
"""Phase-level isolation benchmarks for the r08 optimization round.

NOT part of the driver contract (bench.py is frozen); this file times
individual phases of each headline query with the noop sink (guide
section 1.4) so wall time can be attributed to scan / Arrow boundary /
kernel / driver-side prep, at any SF.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [phase ...]

Phases: pip, tiles, knn, cover, tpch (default: all).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import re
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.1
    which = set(sys.argv[1:]) or {"pip", "tiles", "knn", "cover", "tpch"}

    from pyspark.sql import functions as F

    from fiona_spark import fixtures
    from fiona_spark.operators import spatial
    from fiona_spark.session import get_spark

    spark = get_spark(cores=cpus, app=f"bench-extra-sf{sf}")
    sc = spark.sparkContext

    img_path = fixtures.images_path(spark, sf)
    zone_path = fixtures.zones_path(spark, sf)

    def images():
        return spark.read.parquet(img_path)

    def zones():
        return spark.read.parquet(zone_path)

    out: dict[str, float] = {}

    def t(name, fn, n=2):
        """Run fn n times, keep each timing; first = cold, last = steady."""
        vals = []
        for _ in range(n):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            vals.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = vals
        print(f"#  {name}: {vals}", file=sys.stderr)

    # session warmup (same as bench.py: workers + codegen)
    spark.range(1000).select(F.sum("id")).collect()
    images().limit(1).collect()
    zones().limit(1).collect()
    _warm = F.pandas_udf(lambda v: v * 1.0, "double")
    (spark.range(32 * 1000).repartition(32)
     .select(F.sum(_warm(F.col("id").cast("double")))).collect())

    if "pip" in which:
        # phase A: driver-side zone prep alone
        t("pip/zone_prep", lambda: spatial._zone_prep(
            zones(), ("zone_id",), None,
            row_guard=spatial.MAX_BROADCAST_ZONES))

        # phase B: scan of the 3 point columns only
        t("pip/point_scan", lambda: noop(
            images().select("image_id", "lng", "lat")))

        # phase C: fused UDF output before the zmap join
        def fused_hits():
            import numpy as np
            prep = spatial._zone_prep(zones(), ("zone_id",), None,
                                      row_guard=spatial.MAX_BROADCAST_ZONES)
            (zpdf, res, cov_ridx, cov_cell, edge_offs, ex0, ey0, ex1, ey1,
             feat_wrap) = prep
            order = np.argsort(cov_cell, kind="stable")
            nf = len(zpdf)
            fxmin = np.full(nf, np.inf); fymin = np.full(nf, np.inf)
            fxmax = np.full(nf, -np.inf); fymax = np.full(nf, -np.inf)
            nonempty = edge_offs[:-1] < edge_offs[1:]
            if len(ex0) and nonempty.any():
                seg = edge_offs[:-1][nonempty]
                fxmin[nonempty] = np.minimum.reduceat(ex0, seg)
                fxmax[nonempty] = np.maximum.reduceat(ex0, seg)
                fymin[nonempty] = np.minimum.reduceat(ey0, seg)
                fymax[nonempty] = np.maximum.reduceat(ey0, seg)
            bc = sc.broadcast((cov_cell[order], cov_ridx[order], edge_offs,
                               ex0, ey0, ex1, ey1, feat_wrap,
                               fxmin, fymin, fxmax, fymax))
            matches = spatial._pip_fused_udf(bc, res)
            hits = (images().select("image_id", "lng", "lat")
                    .withColumn("_zidx", F.explode(
                        matches(F.col("lng"), F.col("lat")))))
            noop(hits)
        t("pip/hits_noop", fused_hits)

        # phase D: the full query as benched
        t("pip/full_count", lambda: spatial.pip_join(
            images(), zones()).count())

    if "cover" in which:
        t("cover/full_count", lambda: spatial.with_covering_cells(
            images().select("image_id", "xmin", "ymin", "xmax", "ymax"), 9
        ).count())

    if "knn" in which:
        def knn():
            spatial.knn_join(images(), zones(), k=3,
                             eager_cleanup=False).count()
            spark.catalog.clearCache()
        t("knn/full_count", knn)

    if "tiles" in which:
        # phase A: full scan incl. payload, no Python
        t("tiles/scan_noop", lambda: noop(images().select(
            "image_id", "bytes", "fmt", "w", "h",
            "xmin", "ymin", "xmax", "ymax")))

        # phase B: Arrow round-trip only (identity mapInPandas, passthrough)
        def arrow_rt():
            df = images().select("image_id", "bytes", "fmt", "w", "h",
                                 "xmin", "ymin", "xmax", "ymax")
            schema = df.schema

            def ident(batches):
                for pdf in batches:
                    yield pdf

            noop(df.mapInPandas(ident, schema))
        t("tiles/arrow_ident", arrow_rt)

        # phase C: Arrow in, tiny out (isolates JVM->Py direction + decode-less)
        def arrow_in_only():
            df = images().select("image_id", "bytes", "fmt", "w", "h",
                                 "xmin", "ymin", "xmax", "ymax")

            def cnt(batches):
                import pandas as pd
                n = 0
                for pdf in batches:
                    n += len(pdf)
                yield pd.DataFrame({"n": [n]})

            noop(df.mapInPandas(cnt, "n long"))
        t("tiles/arrow_in_only", arrow_in_only)

        # phase D: the full query as benched
        t("tiles/full_count", lambda: spatial.block_tiles(
            images(), res=12, block=8).count())

    if "tpch" in which:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        li.limit(1).collect()
        t("tpch/full", lambda: (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.avg("l_extendedprice").alias("avg_price"),
                 F.count(F.lit(1)).alias("n"))
            .collect()))

    print(json.dumps({"sf": sf, "cpus": cpus, "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
