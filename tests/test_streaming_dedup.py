"""Streaming stateful dedup + legacy pyexpr filter + embedding near-dup."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fiona_spark.operators import dedup, filters
from fiona_spark.streaming import dedup as sdedup


def test_filter_pyexpr_legacy_translation(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "AREA": [0.005, 0.012, 0.02], "STATE": ["UT", "UT", "CO"],
        "NOTE": [None, "x", None]}))
    got = filters.filter_pyexpr(
        df, "f.properties.AREA > 0.01 and f.properties.STATE == 'UT'"
    ).toPandas()
    assert list(got["AREA"]) == [0.012]
    got2 = filters.filter_pyexpr(
        df, "f.properties.NOTE is None or f.properties.AREA > 0.015").toPandas()
    assert sorted(got2["AREA"]) == [0.005, 0.02]
    from fiona_spark.errors import AttributeFilterError
    with pytest.raises(AttributeFilterError):
        filters.filter_pyexpr(df, "import os")


def _feed(spark, tmp_path, rows):
    src = str(tmp_path / "src")
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def test_streaming_dedup_exact(spark, tmp_path):
    rows = [{"doc_id": i % 3, "text": f"t{i % 3}",
             "ts": f"2024-01-01 00:0{i}:00"} for i in range(6)]
    stream = _feed(spark, tmp_path, rows)
    out = sdedup.streaming_dedup_exact(stream, ["text"], "ts")
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM dd").toPandas()
    # one keeper per distinct text within the watermark horizon
    assert sorted(got["text"]) == ["t0", "t1", "t2"]


def test_keyed_seen_counts_stateful(spark, tmp_path):
    import time
    rows = [{"key": k, "ts": f"2024-01-01 00:00:0{i}"}
            for i, k in enumerate(["a", "a", "b", "a", "b", "c"])]
    stream = _feed(spark, tmp_path, rows)
    out = sdedup.keyed_seen_counts(stream)
    # applyInPandasWithState + availableNow does not self-terminate on
    # this Spark build: run a micro-batch trigger and poll the sink
    q = (out.writeStream.format("memory").queryName("seen")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(processingTime="500 milliseconds")
         .start())
    try:
        got = None
        for _ in range(60):
            time.sleep(1)
            pdf = spark.sql(
                "SELECT key, max(n_seen) AS n FROM seen GROUP BY key"
            ).toPandas()
            if len(pdf) == 3:
                got = pdf.set_index("key")["n"]
                break
        assert got is not None, "stateful sink never produced 3 keys"
        assert got["a"] == 3 and got["b"] == 2 and got["c"] == 1
    finally:
        q.stop()


def test_embedding_neardup_finds_planted_only(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 64))
    vecs[41] = vecs[3] * 1.7          # same direction, different norm
    vecs[42] = vecs[7] + rng.standard_normal(64) * 0.02
    pdf = pd.DataFrame({"vec_id": range(60),
                        "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    got = dedup.embedding_neardup_pairs(emb).toPandas()
    keys = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    assert (3, 41) in keys and (7, 42) in keys
    # integer cosine^2 test: random pairs (cos ~ N(0, 1/8)) stay out
    for a, b in keys:
        ca = vecs[a] @ vecs[b] / np.linalg.norm(vecs[a]) / np.linalg.norm(vecs[b])
        assert ca >= 0.85, (a, b, ca)
