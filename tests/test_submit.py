"""spark-submit --py-files delivery smoke.

North rule: the engine is "delivered as a spark-submit --py-files job".
This test proves it literally: the package is zipped, the job script is
copied OUT of the repo (so the zip — not the checkout — must supply
``npm_search_spark``), and ``spark-submit --master local[4] --py-files
npm_search_spark.zip bootstrap_job.py`` runs a bootstrap crawl
end-to-end in a clean subprocess, producing a non-empty packages table.

Reference analogue: the reference ships as a single long-running node
process (``/root/reference/package.json`` "start" script); the Spark
re-expression ships as a zip + entrypoint pair per README.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark
    except ImportError:  # pragma: no cover
        return None
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not available")
def test_bootstrap_job_via_py_files(tmp_path):
    zip_path = tmp_path / "npm_search_spark.zip"
    pkg = os.path.join(REPO, "npm_search_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    # copy the entrypoint out of the repo: its sys.path fallback then points
    # at tmp_path, so the import below succeeds ONLY via --py-files
    job = tmp_path / "bootstrap_job.py"
    shutil.copy(os.path.join(REPO, "jobs", "bootstrap_job.py"), job)

    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
        SPARK_GRAFT_SUBMITTED="1",  # master comes from spark-submit, as in prod
        SPARK_DRIVER_MEM="2g",
    )
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(job),
            "--root", str(tmp_path / "crawl"),
            "--n-docs", "120",
            "--cores", "4",
            "--max-generations", "4",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert out.returncode == 0, f"stderr tail:\n{out.stderr[-4000:]}"
    json_lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert json_lines, f"no JSON result line in stdout:\n{out.stdout[-2000:]}"
    res = json.loads(json_lines[-1])
    assert res["packages"] > 0
    assert res["generations"] >= 1
