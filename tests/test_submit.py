"""spark-submit --py-files deployment path (tools/submit.sh).

Runs the real spark-submit binary from a non-repo cwd, so the
``crawler_spark`` import inside the job can only be satisfied by the
``--py-files`` zip — the same distribution every executor of a real
cluster uses. One subprocess, ~30 s (its own JVM)."""

import json
import shutil
import subprocess

import pytest


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_submit_py_files_roundtrip(tmp_path):
    out = subprocess.run(
        ["/root/repo/tools/submit.sh", "4", "/root/testdata/sf0.001"],
        cwd=tmp_path,  # NOT the repo: the package must come from the zip
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith('{"job"')][-1]
    res = json.loads(line)
    assert res["job"] == "flagship_classify"
    assert res["rows"] > 0
    assert res["default_parallelism"] == 4
