"""spark-submit --py-files deployment path (tools/submit.sh).

Runs the real spark-submit binary from a non-repo cwd, so the
``crawler_spark`` import inside the job can only be satisfied by the
``--py-files`` zip — the same distribution every executor of a real
cluster uses. One subprocess, ~30 s (its own JVM)."""

import json
import os
import pathlib
import shutil
import subprocess

import pytest

_REPO = pathlib.Path(__file__).resolve().parent.parent
_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_submit_py_files_roundtrip(tmp_path):
    out = subprocess.run(
        [str(_REPO / "tools" / "submit.sh"), "4", _SF_DIR],
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
