"""Resumable checkpointed runs with per-shard lineage manifests.

north_rule: jobs must be "resumable from checkpoint with per-partition
lineage + metrics".  The reference's analogue is the 20 000-feature
write transaction (`fiona/ogrext.pyx:49`, ``writerecs``
`fiona/ogrext.pyx:1677-1693`): work is committed in bounded batches so a
crash loses at most one batch.  Here the commit unit is a *shard* — a
deterministic partition of the key space (typically a coarse cell id,
``cells.parent`` of the join cell) — and the commit record is a JSON
manifest carrying lineage:

    {shard, status, rows, input_files, cell_min, cell_max,
     wall_s, rows_per_s, engine_version, finished_at_epoch}

Layout under ``out_dir``::

    data/shard=<key>/part-0.parquet   -- the shard's output rows
    _manifests/<key>.json             -- written AFTER the data file:
                                         manifest-exists == shard committed

Both writes are tmp-file + ``os.replace`` (atomic on POSIX; on a real
cluster the same pattern holds on HDFS rename / S3 multipart-complete).
A re-run lists committed manifests and anti-joins them out of the input
BEFORE the expensive work, so a killed job resumes where it stopped.
Executor-side writing means no collect — the driver only reads the
small manifest summaries.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ENGINE_VERSION = "fiona_spark-0.1"

MANIFEST_SCHEMA = ("shard string, status string, rows long, n_files int, "
                   "cell_min long, cell_max long, wall_s double, "
                   "rows_per_s double")


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def committed_shards(out_dir: str) -> list[str]:
    """Shard keys whose manifest exists (== durably committed)."""
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    return sorted(fn[:-5] for fn in os.listdir(mdir) if fn.endswith(".json"))


def read_manifests(out_dir: str) -> pd.DataFrame:
    """All commit records as one pandas frame (lineage/metrics report)."""
    mdir = manifest_dir(out_dir)
    recs = []
    if os.path.isdir(mdir):
        for fn in sorted(os.listdir(mdir)):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    recs.append(json.load(f))
    return pd.DataFrame(recs)


def _atomic_write_bytes(path: str, payload: bytes) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def run_checkpointed(df: DataFrame, out_dir: str, shard_col: str,
                     cell_col: str | None = "cell",
                     file_col: str | None = None) -> pd.DataFrame:
    """Materialize ``df`` under ``out_dir`` with per-shard commit + lineage.

    ``df`` must carry ``shard_col`` (string-castable).  Already-committed
    shards are skipped *before* computation (Catalyst prunes them at the
    scan when upstream is partitioned by the shard).  Returns the full
    manifest table (committed + newly written).

    ``cell_col`` (optional): lineage records the shard's cell range.
    ``file_col`` (optional): a column carrying ``input_file_name()`` —
    recorded as the shard's input file count.
    """
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    os.makedirs(data_dir(out_dir), exist_ok=True)
    done = committed_shards(out_dir)

    work = df.withColumn("_shard", F.col(shard_col).cast("string"))
    if done:
        done_df = work.sparkSession.createDataFrame(
            [(s,) for s in done], "_shard string")
        work = work.join(F.broadcast(done_df), "_shard", "left_anti")

    out_d = data_dir(out_dir)
    man_d = manifest_dir(out_dir)
    cell_name = cell_col
    file_name = file_col

    def write_shards(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        buf: dict[str, list[pd.DataFrame]] = {}
        t0 = time.perf_counter()
        for pdf in batches:
            for key, grp in pdf.groupby("_shard", sort=False):
                buf.setdefault(str(key), []).append(grp)
        # upstream compute time (draining the batches), amortized over
        # the task's shards so per-shard throughput includes the work,
        # not just the parquet write
        compute_s = time.perf_counter() - t0
        per_shard_compute = compute_s / max(1, len(buf))
        recs = []
        for key, parts in buf.items():
            ts = time.perf_counter()
            shard_pdf = pd.concat(parts, ignore_index=True)
            n_files = (shard_pdf[file_name].nunique() if file_name else 0)
            cmin = cmax = -1
            if cell_name and cell_name in shard_pdf.columns:
                cv = shard_pdf[cell_name].to_numpy(np.int64)
                if len(cv):
                    cmin, cmax = int(cv.min()), int(cv.max())
            drop = ["_shard"] + ([file_name] if file_name else [])
            payload = shard_pdf.drop(columns=drop)
            sdir = os.path.join(out_d, f"shard={key}")
            os.makedirs(sdir, exist_ok=True)
            final = os.path.join(sdir, "part-0.parquet")
            tmp = f"{final}.tmp.{uuid.uuid4().hex[:8]}"
            pq.write_table(pa.Table.from_pandas(payload, preserve_index=False), tmp)
            os.replace(tmp, final)
            wall = (time.perf_counter() - ts) + per_shard_compute
            rec = {
                "shard": key, "status": "committed",
                "rows": int(len(payload)), "n_files": int(n_files),
                "cell_min": cmin, "cell_max": cmax,
                "wall_s": round(wall, 4),
                "rows_per_s": round(len(payload) / wall, 1) if wall > 0 else 0.0,
                "engine_version": ENGINE_VERSION,
                "finished_at_epoch": time.time(),
            }
            # manifest LAST: its existence is the commit
            _atomic_write_bytes(os.path.join(man_d, f"{key}.json"),
                                json.dumps(rec).encode())
            recs.append({k: rec[k] for k in
                         ("shard", "status", "rows", "n_files", "cell_min",
                          "cell_max", "wall_s", "rows_per_s")})
        yield pd.DataFrame(recs, columns=["shard", "status", "rows", "n_files",
                                          "cell_min", "cell_max", "wall_s",
                                          "rows_per_s"])

    # hash-repartition on the shard key: each shard lands wholly in one
    # task -> one data file + one manifest per shard, no cross-task racing
    (work.repartition("_shard")
         .mapInPandas(write_shards, MANIFEST_SCHEMA)
         .count())  # force execution; manifests are the durable output
    return read_manifests(out_dir)


def read_checkpointed(spark, out_dir: str) -> DataFrame:
    """Read back a checkpointed dataset (only committed shards)."""
    done = set(committed_shards(out_dir))
    d = data_dir(out_dir)
    paths = [os.path.join(d, f"shard={s}", "part-0.parquet") for s in done]
    return spark.read.parquet(*paths)
