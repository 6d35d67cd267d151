"""Iceberg-style table layout over parquet (snapshot manifests).

The north_rule targets "Iceberg tables of image+caption pairs"; this
sandbox ships no Iceberg runtime jar, so this module implements the
table-format properties the engine actually relies on, on plain
parquet — the same contract surface, swappable for real Iceberg by
replacing ``spark.read.parquet(files)`` with ``spark.read.table``:

  * **snapshot isolation**: every commit writes an immutable numbered
    snapshot manifest (``v<N>.json``) listing exactly the data files of
    that version; readers resolve a snapshot, never a directory glob,
    so concurrent appends can't tear a read.
  * **appends without rewrite**: an append commit lists old + new files.
  * **time travel**: ``read_table(..., snapshot=N)``.
  * **partition layout**: data files live under ``part=<value>/`` key
    directories; reading with ``partition_filter`` prunes file lists
    BEFORE Spark sees them (manifest-level pruning, like Iceberg's).
  * **stats**: per-file row counts in the manifest (used for CBO-ish
    decisions like broadcast eligibility).

Commit protocol is tmp-file + atomic rename of the manifest; the
manifest is the source of truth (half-written data files of a crashed
commit are simply never referenced) — the same recovery story as
``fiona_spark.checkpoint``.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame


def _snap_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def current_snapshot_id(path: str) -> int | None:
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return None
    vs = [int(f[1:-5]) for f in os.listdir(d)
          if f.startswith("v") and f.endswith(".json")]
    return max(vs) if vs else None


def read_manifest(path: str, snapshot: int | None = None) -> dict:
    sid = snapshot if snapshot is not None else current_snapshot_id(path)
    if sid is None:
        raise FileNotFoundError(f"no snapshots under {path!r}")
    with open(os.path.join(_snap_dir(path), f"v{sid}.json")) as f:
        return json.load(f)


def _write_files(df: DataFrame, path: str, partition_by: str | None) -> list[dict]:
    """Write df as parquet files under a unique commit dir; return file
    records (path, partition value, rows)."""
    commit = uuid.uuid4().hex[:12]
    out_dir = os.path.join(path, "data", f"commit-{commit}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(out_dir)

    import pyarrow.parquet as pq
    recs = []
    for root, _dirs, files in os.walk(out_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            full = os.path.join(root, fn)
            part_val = None
            if partition_by:
                for seg in os.path.relpath(root, out_dir).split(os.sep):
                    if seg.startswith(f"{partition_by}="):
                        part_val = seg.split("=", 1)[1]
            recs.append({"path": full, "partition": part_val,
                         "rows": pq.ParquetFile(full).metadata.num_rows})
    return recs


def _commit(path: str, files: list[dict], schema_json: str,
            partition_by: str | None, op: str,
            properties: dict | None = None) -> int:
    os.makedirs(_snap_dir(path), exist_ok=True)
    prev = current_snapshot_id(path)
    sid = (prev or 0) + 1
    man = {"snapshot": sid, "parent": prev, "operation": op,
           "partition_by": partition_by,
           "committed_at_epoch": time.time(),
           "total_rows": sum(f["rows"] for f in files),
           "properties": dict(properties or {}),
           "files": files, "schema": schema_json}
    final = os.path.join(_snap_dir(path), f"v{sid}.json")
    tmp = f"{final}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, final)
    return sid


def write_table(df: DataFrame, path: str, partition_by: str | None = None,
                crs=None, properties: dict | None = None) -> int:
    """Create/replace the table: new snapshot referencing ONLY new files.

    ``crs`` records the layer's coordinate system as a table property
    (the reference stores crs/crs_wkt in every layer's metadata,
    `fiona/collection.py`); it round-trips via :func:`table_crs`.
    """
    from ..crs import attach_crs
    props = attach_crs(properties, crs) if crs is not None else properties
    files = _write_files(df, path, partition_by)
    return _commit(path, files, df.schema.json(), partition_by, "overwrite",
                   props)


def append_table(df: DataFrame, path: str) -> int:
    """Append commit: snapshot = parent's files + new files (parent's
    table properties — CRS included — carry forward)."""
    man = read_manifest(path)
    files = _write_files(df, path, man.get("partition_by"))
    return _commit(path, man["files"] + files, man["schema"],
                   man.get("partition_by"), "append",
                   man.get("properties"))


def table_crs(path: str, snapshot: int | None = None):
    """CRS recorded on the table, or None (reference Collection.crs)."""
    from ..crs import crs_of
    return crs_of(read_manifest(path, snapshot).get("properties"))


def read_table(spark, path: str, snapshot: int | None = None,
               partition_filter=None) -> DataFrame:
    """Read one snapshot; ``partition_filter(value) -> bool`` prunes the
    file list at the manifest level before Spark plans the scan."""
    man = read_manifest(path, snapshot)
    files = man["files"]
    if partition_filter is not None:
        files = [f for f in files if partition_filter(f["partition"])]
    if not files:
        from pyspark.sql import types as T
        return spark.createDataFrame([], T.StructType.fromJson(
            json.loads(man["schema"])))
    return spark.read.parquet(*[f["path"] for f in files])


def table_stats(path: str, snapshot: int | None = None) -> dict:
    man = read_manifest(path, snapshot)
    return {"snapshot": man["snapshot"], "operation": man["operation"],
            "n_files": len(man["files"]), "total_rows": man["total_rows"],
            "partitions": sorted({f["partition"] for f in man["files"]
                                  if f["partition"] is not None})}


def history(path: str) -> list[dict]:
    """Snapshot log (Iceberg's table history)."""
    d = _snap_dir(path)
    out = []
    for sid in sorted(int(f[1:-5]) for f in os.listdir(d)
                      if f.startswith("v") and f.endswith(".json")):
        m = read_manifest(path, sid)
        out.append({"snapshot": sid, "operation": m["operation"],
                    "total_rows": m["total_rows"], "parent": m["parent"]})
    return out
