"""The north rule's launch contract, actually executed: `spark-submit
--py-files erp.zip run_pipeline.py` as a real subprocess, at N=2 and 4N=8
local cores, from a cwd where the package is NOT filesystem-importable —
so the test proves the zip shipping, the absolute-import layout, and the
entrypoint's one-line JSON contract, and pins parallelism-invariance of
the pipeline's results across the two levels (wall-clock scaling numbers
live in bench.py's pinned protocol; a shared-JVM pytest box can't measure
those honestly here).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("no spark-submit on PATH")


def test_spark_submit_pyfiles_two_parallelism_levels(tmp_path):
    pkg = os.path.join(REPO, "entity_resolution_pipeline_spark")
    zip_path = str(tmp_path / "erp.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    script = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(pkg, "run_pipeline.py"), script)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    results, walls = {}, {}
    for cores in (2, 8):
        wh = str(tmp_path / f"wh{cores}")
        t0 = time.time()
        proc = subprocess.run(
            [
                _spark_submit_bin(),
                "--master", f"local[{cores}]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                script,
                "--warehouse", wh,
                "--entities", "200",
                "--n-label-pairs", "800",
            ],
            cwd=str(tmp_path),
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )
        walls[cores] = time.time() - t0
        assert proc.returncode == 0, proc.stderr[-4000:]
        json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        assert json_lines, proc.stdout[-2000:]
        results[cores] = json.loads(json_lines[-1])

    r2, r8 = results[2], results[8]
    # the contract line carries counts + evaluation
    for r in (r2, r8):
        assert r["n_pages"] > 0 and r["candidate_pairs"] > 0
        assert r["evaluation"]["blocked_pairs"]["f1"] >= 0.99, r["evaluation"]
    # parallelism-invariance: same input -> identical results at 2 and 8 cores
    assert r2["n_pages"] == r8["n_pages"]
    assert r2["candidate_pairs"] == r8["candidate_pairs"]
    assert r2["n_clusters"] == r8["n_clusters"]
    assert r2["evaluation"]["blocked_pairs"] == r8["evaluation"]["blocked_pairs"]
