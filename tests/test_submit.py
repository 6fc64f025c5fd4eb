"""spark-submit --py-files deployment contract (north rule): the package
zips to a self-contained --py-files artifact, and a job launched from a
FOREIGN cwd imports fairy_core_spark from the zip alone and runs rule +
spatial operators."""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"


def test_spark_submit_py_files_zip(tmp_path):
    zip_path = tmp_path / "fairy_core_spark.zip"
    mk = subprocess.run(
        [sys.executable, f"{REPO}/scripts/make_submit_zip.py", str(zip_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert "wrote" in mk.stdout, mk.stderr

    cp = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", str(zip_path),
            f"{REPO}/scripts/submit_demo.py",
        ],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    ok = [ln for ln in cp.stdout.splitlines() if ln.startswith("SUBMIT_OK")]
    assert ok, f"stdout:\n{cp.stdout[-1500:]}\nstderr:\n{cp.stderr[-1500:]}"
    line = ok[0]
    # imported from the shipped zip, not the repo checkout
    assert "fairy_core_spark.zip/fairy_core_spark/__init__.py" in line
    assert "n_bad=2" in line and "cells=3" in line
