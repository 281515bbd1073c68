"""REAL spark-submit launches (north_rule: 'launched with spark-submit
--py-files at N and 4N executors').

These invoke the actual /opt/spark/bin/spark-submit binary — not an
in-process main() call — with the package shipped via --py-files as a zip,
at local[2] and local[8] (the N / 4N pair sized for a CI-speed smoke; the
bench-grade 4/16 measurement lives in tools/bench_scaling.py). Asserts the
run commits its tables and that both parallelism levels produce the
identical scored-pair multiset.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark"


def _zip_pkg(tmp_path) -> str:
    zpath = str(tmp_path / "pkg.zip")
    root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirnames, filenames in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="no spark-submit binary")
def test_spark_submit_py_files_two_parallelism_levels(spark, tmp_path):
    zpath = _zip_pkg(tmp_path)
    job = os.path.join(REPO, PKG, "jobs", "reconcile_job.py")
    outs = {}
    for cores in (2, 8):  # N and 4N
        out = str(tmp_path / f"out_{cores}")
        cmd = [
            SUBMIT, "--master", f"local[{cores}]", "--py-files", zpath,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=3g",
            job, "--synth", "300", "--output", out, "--max-block-size", "500",
        ]
        env = {**os.environ}
        env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=900, env=env, cwd=str(tmp_path),
        )
        assert res.returncode == 0, res.stderr[-4000:]
        assert os.path.exists(os.path.join(out, "scored", "_COMMIT")), res.stdout[-2000:]
        outs[cores] = out

    # both parallelism levels commit the IDENTICAL scored multiset
    a = spark.read.parquet(os.path.join(outs[2], "scored", "data"))
    b = spark.read.parquet(os.path.join(outs[8], "scored", "data"))
    key = lambda r: (r["left_id"], r["right_id"], r["match_prob"], r["is_match_pred"])  # noqa: E731
    ra, rb = sorted(map(key, a.collect())), sorted(map(key, b.collect()))
    assert ra == rb and len(ra) > 0
