"""Deployment-seam e2e: package.sh zip + spark-submit --py-files.

The driver (and any real cluster) ships the engine as a --py-files
archive, where `Path(__file__)` points inside a zip — a seam the
in-process tests can't see (jar/resource paths, data-artifact
extraction, import layout). This launches the packaged artifact on a
plain local[2] spark-submit from a NEUTRAL cwd (so the repo dir can't
shadow the zip import) and asserts the flagship runs end-to-end, on
the compiled-kernel path, with the expected sf0.001 output.
"""

import os
import subprocess
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

DRIVER_SCRIPT = """
import sys
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[2]")
         .appName("e2e-packaged").config("spark.ui.enabled", "false")
         .getOrCreate())

import equi7grid_spark
assert ".zip" in equi7grid_spark.__file__, (
    "engine must import from the zip, got " + equi7grid_spark.__file__)

from equi7grid_spark.operators import kernel
from equi7grid_spark.operators.assign_jvm import tile_counts_jvm
from equi7grid_spark.images import synthetic_images

print("KERNEL_AVAILABLE", kernel.kernel_available(spark))
imgs = synthetic_images(spark, 5000, with_bytes=False)
out = tile_counts_jvm(imgs, tiling_id="T6")
rows = out.count()
total = sum(r.n for r in out.collect())
print("E2E_RESULT", rows, total)
spark.stop()
"""


def test_spark_submit_packaged_flagship(tmp_path):
    subprocess.run(
        ["bash", str(REPO / "scripts" / "package.sh")], check=True, cwd=REPO,
        capture_output=True,
    )
    zip_path = REPO / "equi7grid_spark.zip"
    assert zip_path.exists()
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
        assert "equi7grid_spark/jvm/equi7-kernel.jar" in names
        assert any(n.startswith("equi7grid_spark/data/") for n in names)

    script = tmp_path / "driver.py"
    script.write_text(DRIVER_SCRIPT)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--py-files", str(zip_path),
            str(script),
        ],
        cwd=tmp_path,  # neutral cwd: repo checkout must not be importable
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    assert proc.returncode == 0, f"spark-submit failed:\n{tail}"
    assert "KERNEL_AVAILABLE True" in proc.stdout, tail
    result = [ln for ln in proc.stdout.splitlines() if ln.startswith("E2E_RESULT")]
    assert result, tail
    _, rows, total = result[0].split()
    # 5000 seeded images, every one assigned to exactly one tile
    assert int(total) == 5000
    assert int(rows) > 100
