#!/usr/bin/env python
"""Production-entry job for ``spark-submit --py-files`` (north_rule).

Usage (what a cluster submitter runs; works identically on YARN/K8s):

    python -m fiona_spark.session  # build the py-files zip, then:
    spark-submit --master local[8] \
        --py-files /tmp/fiona_spark_pyfiles.zip \
        scripts/submit_job.py <images_parquet> <zones_parquet> <out_dir> [res]

Runs the flagship pipeline — PIP spatial join + covering-cell tile
assignment — writing results plus per-shard checkpoint manifests under
``out_dir`` (resumable: rerunning skips committed shards), and prints a
one-line JSON report with row counts and throughput.

The script imports ``fiona_spark`` ONLY from the shipped zip/path — it
must not assume the repo checkout exists on executors.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    images_path, zones_path, out_dir = sys.argv[1:4]
    res = int(sys.argv[4]) if len(sys.argv) > 4 else 7

    spark = SparkSession.builder.appName("fiona_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from fiona_spark import checkpoint, cells
    from fiona_spark.operators import spatial

    t0 = time.perf_counter()
    images = spark.read.parquet(images_path)
    zones = spark.read.parquet(zones_path)
    n_img = images.count()

    pip = spatial.pip_join(images, zones, res=res)
    tiles = spatial.with_covering_cells(
        images.select("image_id", "xmin", "ymin", "xmax", "ymax"), res + 2)

    # shard on the coarse parent cell: checkpoint unit == spatial locality
    shard = F.expr(cells.cell_id_sql("(xmin + xmax) / 2e0", "(ymin + ymax) / 2e0", 2))
    man = checkpoint.run_checkpointed(
        tiles.withColumn("_ck_shard", shard), f"{out_dir}/tiles", "_ck_shard")
    n_pip = pip.count()
    wall = time.perf_counter() - t0

    print(json.dumps({
        "n_images": n_img,
        "pip_rows": n_pip,
        "tile_rows": int(man["rows"].sum()),
        "shards_committed": len(man),
        "wall_s": round(wall, 2),
        "images_per_sec": round(n_img / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
