"""spark-submit --py-files packaging path (north_rule shipping
requirement): the zipped package must be importable on executors with
the repo absent from the working directory."""

import json
import os
import subprocess
import sys

import pyspark
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_with_py_files(tmp_path):
    out_zip = str(tmp_path / "engine.zip")
    subprocess.run([sys.executable, f"{ROOT}/scripts/package.py", out_zip],
                   check=True, capture_output=True)
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                "bin", "spark-submit")
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", out_zip,
         f"{ROOT}/scripts/submit_job.py", "--sf-dir",
         "/root/testdata/sf0.001", "--store", str(tmp_path / "store")],
        capture_output=True, text=True, check=True,
        cwd=str(tmp_path), timeout=400)
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["polygon_counts"] == {"0": 284, "1": 421, "2": 485}
    # resume: second run loads the persisted snapshot
    proc2 = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", out_zip,
         f"{ROOT}/scripts/submit_job.py", "--sf-dir",
         "/root/testdata/sf0.001", "--store", str(tmp_path / "store")],
        capture_output=True, text=True, check=True,
        cwd=str(tmp_path), timeout=400)
    line2 = [l for l in proc2.stdout.splitlines() if l.startswith("{")][-1]
    res2 = json.loads(line2)
    assert res2["polygon_counts"] == res["polygon_counts"]
