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


# ---------------------------------------------------------------------------
# fiona.Env parity (`fiona/env.py:64-307`): a nestable context manager of
# configuration options.  GDAL config options become session state; the
# credential options the reference forwards to its cloud sessions
# (`fiona/session.py:20-655`) map onto the PUBLIC Hadoop S3A keys, the
# SURVEY section 2.1 "cloud credentials" mapping.
# ---------------------------------------------------------------------------

#: reference credential option -> Hadoop S3A configuration key
_S3A_KEYS = {
    "AWS_ACCESS_KEY_ID": "fs.s3a.access.key",
    "AWS_SECRET_ACCESS_KEY": "fs.s3a.secret.key",
    "AWS_SESSION_TOKEN": "fs.s3a.session.token",
    "AWS_REGION": "fs.s3a.endpoint.region",
    "AWS_S3_ENDPOINT": "fs.s3a.endpoint",
}

_env_stack: list[dict] = []


def getenv() -> dict:
    """Options of the innermost active Env (`fiona/env.py:313-325`)."""
    if not _env_stack:
        raise RuntimeError("no fiona_spark.env.Env is active")
    return dict(_env_stack[-1])


def hasenv() -> bool:
    return bool(_env_stack)


class Env:
    """``with Env(spark, AWS_ACCESS_KEY_ID=..., CPL_DEBUG=True): ...``

    Nestable: inner envs inherit-and-override the outer options
    (`fiona/env.py:404-411` option stacking); exit restores the
    previous Hadoop configuration values exactly.  Options without an
    S3A mapping are held as plain env state (queryable via
    :func:`getenv`) — the engine has no GDAL to forward them to.
    """

    def __init__(self, spark=None, **options):
        self._spark = spark
        self.options = options
        self._restore: dict[str, str | None] = {}

    def _hconf(self):
        return self._spark.sparkContext._jsc.hadoopConfiguration()

    def __enter__(self):
        merged = dict(_env_stack[-1]) if _env_stack else {}
        merged.update(self.options)
        _env_stack.append(merged)
        if self._spark is not None:
            conf = self._hconf()
            for name, val in self.options.items():
                key = _S3A_KEYS.get(name)
                if key is None:
                    continue
                self._restore[key] = conf.get(key)
                conf.set(key, str(val))
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        _env_stack.pop()
        if self._spark is not None:
            conf = self._hconf()
            for key, prev in self._restore.items():
                if prev is None:
                    conf.unset(key)
                else:
                    conf.set(key, prev)
        self._restore = {}
