"""End-to-end ``spark-submit --py-files`` packaging test (north_rule).

Runs the production entry script in a clean subprocess whose ONLY access
to the engine is the py-files zip — proving the package ships to
executors the way a real multi-executor cluster submission would.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from fiona_spark import fixtures
from fiona_spark.session import build_pyfiles_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(spark, tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")

    img = str(tmp_path / "img.parquet")
    zon = str(tmp_path / "zones.parquet")
    out = str(tmp_path / "out")
    spark.createDataFrame(fixtures.gen_images_pdf(0, 300),
                          schema=fixtures.IMAGES_SCHEMA).write.parquet(img)
    spark.createDataFrame(fixtures.gen_zones_pdf(20),
                          schema=fixtures.ZONES_SCHEMA).write.parquet(zon)
    zip_path = build_pyfiles_zip(str(tmp_path / "pyfiles.zip"))

    env = {k: v for k, v in os.environ.items()}
    env.pop("PYTHONPATH", None)          # engine must come from the zip
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         img, zon, out, "6"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),               # NOT the repo: no implicit import
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_images"] == 300
    assert report["tile_rows"] > 0 and report["shards_committed"] > 0

    # resume: rerun skips all committed shards (manifests unchanged)
    manifests = sorted(os.listdir(os.path.join(out, "tiles", "_manifests")))
    proc2 = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         img, zon, out, "6"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env)
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    report2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert report2["tile_rows"] == report["tile_rows"]
    assert sorted(os.listdir(os.path.join(out, "tiles", "_manifests"))) == manifests
