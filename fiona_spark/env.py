"""Environment / dataset inspection — set-oriented analogues of the
reference's CLI debug surfaces ``fio env`` and ``fio insp``
(`fiona/fio/env.py:22-39`, `fiona/fio/insp.py`).

The reference's ``env`` prints the available formats and data paths;
``insp`` drops into a REPL over an open collection.  An engine driven
by spark-submit has no REPL, so ``insp`` here returns the record a
user would interrogate interactively: schema, count, bounds, driver
capabilities, and a head sample.
"""

from __future__ import annotations

import os


def env_info(spark=None) -> dict:
    """``fio env`` analogue: format registry + engine environment.

    ``--formats`` maps to the driver/modes table; GDAL/PROJ data paths
    map to the Spark runtime facts a cluster job depends on.
    Credentials are NEVER echoed (the reference prints session
    credentials; a shared cluster log must not).
    """
    from .sources.drivers import supported_drivers

    rec: dict = {"formats": supported_drivers()}
    if spark is not None:
        sc = spark.sparkContext
        rec["spark"] = {
            "version": spark.version,
            "master": sc.master,
            "app_name": sc.appName,
            "default_parallelism": sc.defaultParallelism,
            "shuffle_partitions": spark.conf.get(
                "spark.sql.shuffle.partitions", None),
            "aqe": spark.conf.get("spark.sql.adaptive.enabled", None),
            "warehouse": spark.conf.get(
                "spark.sql.warehouse.dir", None),
        }
    rec["java_home"] = os.environ.get("JAVA_HOME")
    return rec


def format_listing() -> str:
    """The exact ``fio env --formats`` text shape:
    ``name (modes 'r', 'w')`` per line (`fiona/fio/env.py:29-32`)."""
    from .sources.drivers import supported_drivers

    lines = []
    for name, modes in sorted(supported_drivers().items()):
        quoted = ", ".join(f"'{m}'" for m in modes)
        lines.append(f"{name} (modes {quoted})")
    return "\n".join(lines) + "\n"


def insp(spark, path: str, n: int = 5) -> dict:
    """``fio insp`` analogue, non-interactive: everything the REPL
    session would show — the info record (count, schema, bounds,
    driver metadata) plus the first ``n`` rows as dicts."""
    from .sources.catalog import info, open_any

    rec = info(spark, path)
    # head rows through the SAME driver-resolved reader info() used —
    # spark.read.parquet here broke insp on every non-parquet format
    df, _ = open_any(spark, path)
    rec["head"] = [r.asDict(recursive=True)
                   for r in df.limit(n).collect()]
    return rec
