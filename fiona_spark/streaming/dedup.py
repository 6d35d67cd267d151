"""Stateful streaming operators: exact dedup + custom per-key state.

The training-pipeline extension of SURVEY.md section 2.9: dedup over an
UNBOUNDED feature/document stream.  Two shapes:

  * :func:`streaming_dedup_exact` — Spark-native
    ``dropDuplicatesWithinWatermark``: state bounded by the watermark,
    exactly-once keeper semantics per content key.  This is the 100 TB
    path: state is hash-partitioned by key across executors and expires
    with the watermark.
  * :func:`keyed_seen_counts` — ``applyInPandasWithState``: the custom
    stateful-operator surface (GroupState + timeout) the engine exposes
    for operators Spark lacks; implemented here as a per-key first-seen
    tracker that emits (key, n_seen, first_ts) updates — the building
    block for streaming near-dup (bucket a stream by LSH band key, keep
    per-bucket state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_exact(stream: DataFrame, key_cols: list[str],
                          ts_col: str = "ts",
                          watermark: str = "30 minutes") -> DataFrame:
    """Exact streaming dedup: first arrival per content key passes,
    duplicates within the watermark horizon are dropped, state expires
    with the watermark (bounded memory on an unbounded stream)."""
    return (stream
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


_STATE_SCHEMA = T.StructType([
    T.StructField("n_seen", T.LongType()),
    T.StructField("first_ts", T.StringType()),
])

_OUT_SCHEMA = ("key string, n_seen long, first_ts string, "
               "batch_rows long")


def keyed_seen_counts(stream: DataFrame, key_col: str = "key",
                      ts_col: str = "ts") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``.

    Per key: cumulative occurrence count + first-seen timestamp,
    emitted once per micro-batch the key appears in.  State times out
    on processing time (1 h idle) so abandoned keys do not accumulate —
    the per-key-state discipline any custom streaming operator on this
    engine follows.
    """
    def update(key, pdfs, state: GroupState):
        rows = 0
        first_ts = None
        for pdf in pdfs:
            rows += len(pdf)
            t = str(pdf[ts_col].min())
            first_ts = t if first_ts is None else min(first_ts, t)
        if state.exists:
            n_seen, prev_first = state.get
            n_seen += rows
            first_ts = min(first_ts, prev_first)
        else:
            n_seen = rows
        state.update((n_seen, first_ts))
        state.setTimeoutDuration(3_600_000)
        yield pd.DataFrame({"key": [key[0]], "n_seen": [n_seen],
                            "first_ts": [first_ts], "batch_rows": [rows]})

    return (stream.groupBy(key_col)
            .applyInPandasWithState(update, _OUT_SCHEMA, _STATE_SCHEMA,
                                    "update",
                                    GroupStateTimeout.ProcessingTimeTimeout))
