"""SparkSession factory tuned for the engine.

Mirrors the reference's env/session layer (`fiona/env.py:64-307`,
`fiona/session.py:20-655` cloud credential sessions) at the Spark level:
one place that owns configuration, and — critically for multi-executor
clusters — ships the ``fiona_spark`` package to executors as a py-files
zip, which is exactly what ``spark-submit --py-files`` does in
production (north_rule packaging requirement).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the fiona_spark package for ``spark-submit --py-files``.

    Deterministic content; rebuilt on demand.  Returns the zip path.
    """
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "fiona_spark_pyfiles.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("fiona_spark", os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return dest


def get_spark(cores: int | None = None, app: str = "fiona_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or '*'.  Shuffle partitions
    default to the core count (local mode: 200 would over-parallelize
    tiny stages; on a real cluster this conf is sized to executors x
    cores by the submitter).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or cores or os.cpu_count() or 8

    b = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.default.parallelism", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # Ship the package so executor Python workers can re-import it by
    # name (same mechanism as spark-submit --py-files on a cluster).
    try:
        spark.sparkContext.addPyFile(build_pyfiles_zip())
    except Exception:
        pass  # already added in a reused session
    return spark
