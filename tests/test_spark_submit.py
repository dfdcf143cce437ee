"""Real `spark-submit --py-files` launch of the production entry point
(jobs/extract_job.py) — the exact north-rule launch shape: package
zipped, shipped via --py-files, job sharded + ledger-committed, resume
and audit exercised through a second identical invocation.

Marked by runtime (~2 spark-submit JVMs, ~1.5 min); the ledger/resume
semantics themselves are unit-tested fast in test_ledger.py — this test
pins the LAUNCH path (zip packaging, spark-submit arg plumbing, exit
codes).
"""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_spark_submit():
    if shutil.which("spark-submit"):
        return "spark-submit"
    try:
        import pyspark

        cand = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
        if os.path.exists(cand):
            return cand
    except ImportError:
        pass
    return None


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "docling_core_spark.zip")
    pkg = os.path.join(REPO, "docling_core_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith((".pyc",)):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath, out_dir, extra=()):
    cmd = [
        _find_spark_submit(),
        "--master", "local[4]",
        "--py-files", zpath,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        os.path.join(REPO, "jobs", "extract_job.py"),
        "--synth", "400",
        "--output", out_dir,
        "--num-shards", "8",
        "--shards-per-batch", "4",
        *extra,
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, env=env,
        cwd=str(os.path.dirname(zpath)),  # not the repo: --py-files must supply the pkg
    )


@pytest.mark.skipif(_find_spark_submit() is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_launch_resume_audit(tmp_path):
    zpath = _zip_package(tmp_path)
    out_dir = str(tmp_path / "run")

    first = _submit(zpath, out_dir)
    assert first.returncode == 0, first.stdout[-2000:] + first.stderr[-2000:]
    line = [ln for ln in first.stdout.splitlines() if ln.startswith("{")][-1]
    s1 = json.loads(line)
    assert s1["committed_this_run"] == 8 and s1["pending"] == 0
    assert s1["docs"] == 403  # 400 + the 3 fixture shape docs

    # identical re-invocation: everything already committed -> resume
    # commits nothing, audit green, exit 0
    second = _submit(zpath, out_dir, extra=("--audit",))
    assert second.returncode == 0, (
        second.stdout[-2000:] + second.stderr[-2000:]
    )
    line = [ln for ln in second.stdout.splitlines() if ln.startswith("{")][-1]
    s2 = json.loads(line)
    assert s2["committed_this_run"] == 0
    assert s2["committed_total"] == 8
    assert s2["audit_ok"] is True
