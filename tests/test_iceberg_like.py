"""Snapshot-table layer: isolation, append, time travel, pruning."""

import pytest
from pyspark.sql import functions as F

from fiona_spark import fixtures
from fiona_spark.sources import iceberg_like as it


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(fixtures.gen_images_pdf(0, 400),
                                 schema=fixtures.IMAGES_SCHEMA).cache()


def test_write_read_roundtrip(spark, images, tmp_path):
    path = str(tmp_path / "t1")
    sid = it.write_table(images, path)
    assert sid == 1
    back = it.read_table(spark, path)
    assert back.count() == 400
    assert set(back.columns) == set(images.columns)


def test_append_and_time_travel(spark, images, tmp_path):
    path = str(tmp_path / "t2")
    it.write_table(images.filter("image_id < 'img0000000200'"), path)
    it.append_table(images.filter("image_id >= 'img0000000200'"), path)
    assert it.read_table(spark, path).count() == 400
    assert it.read_table(spark, path, snapshot=1).count() == 200
    hist = it.history(path)
    assert [h["operation"] for h in hist] == ["overwrite", "append"]
    assert hist[1]["parent"] == 1


def test_partition_pruning(spark, images, tmp_path):
    path = str(tmp_path / "t3")
    from fiona_spark.operators import spatial
    df = spatial.with_point_cell(images, 2).withColumn(
        "cell_prefix", F.col("cell").cast("string"))
    it.write_table(df, path, partition_by="cell_prefix")
    stats = it.table_stats(path)
    assert len(stats["partitions"]) > 1
    one = stats["partitions"][0]
    pruned = it.read_table(spark, path, partition_filter=lambda p: p == one)
    full = it.read_table(spark, path)
    assert 0 < pruned.count() < full.count()
    # manifest-level pruning: fewer files reach Spark
    man = it.read_manifest(path)
    n_files_one = sum(1 for f in man["files"] if f["partition"] == one)
    assert pruned.rdd.getNumPartitions() <= max(n_files_one, 1) + 1


def test_crash_safety_unreferenced_files(spark, images, tmp_path):
    """A torn commit (data written, manifest not) is invisible."""
    path = str(tmp_path / "t4")
    it.write_table(images.limit(100), path)
    # simulate: extra data files appear without a manifest commit
    images.limit(50).write.parquet(f"{path}/data/commit-deadbeef")
    assert it.read_table(spark, path).count() == 100


def test_empty_snapshot_filter(spark, images, tmp_path):
    path = str(tmp_path / "t5")
    from fiona_spark.operators import spatial
    df = spatial.with_point_cell(images, 2).withColumn(
        "cell_prefix", F.col("cell").cast("string"))
    it.write_table(df, path, partition_by="cell_prefix")
    out = it.read_table(spark, path, partition_filter=lambda p: False)
    assert out.count() == 0
    assert "image_id" in out.columns
