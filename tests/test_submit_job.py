"""The north-rule run mode: the engine launches via ``spark-submit
--py-files <zip>`` with no installed package — a real subprocess, real zip,
real JVM, asserting the job writes partitioned output and resumes."""

import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pyspark

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = Path(pyspark.__file__).parent / "bin" / "spark-submit"


def _build_zip(tmp: Path) -> Path:
    zpath = tmp / "rasteret_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "rasteret_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zpath = _build_zip(tmp_path)
    out = tmp_path / "zonal_out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY way to the package
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        str(SPARK_SUBMIT), "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.driver.memory=3g",
        "--py-files", str(zpath),
        str(REPO / "scripts" / "submit_zonal_job.py"),
        "--images", "20", "--aois", "12", "--n-parts", "4",
        "--out", str(out),
    ]
    r = subprocess.run(
        cmd, cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420
    )
    assert r.returncode == 0, r.stderr[-3000:]
    marker = [ln for ln in r.stdout.splitlines() if ln.startswith("ZONAL_ROWS=")]
    assert marker, r.stdout[-2000:]
    rows = int(marker[0].split()[0].split("=")[1])
    assert rows > 0
    # partition-granular checkpoint log + partitioned parquet on disk
    assert (out / "_lineage").exists()
    parts = list(out.rglob("*.parquet"))
    assert parts, f"no parquet written under {out}"
    # resume run: everything already logged -> same rows, no recompute errors
    r2 = subprocess.run(
        cmd + ["--resume"], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert f"ZONAL_ROWS={rows}" in r2.stdout
