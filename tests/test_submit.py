"""North-rule deployment shape: the pipeline must run via
``spark-submit --py-files blink_spark.zip`` — a REAL spark-submit
subprocess here, from a neutral cwd so the package import genuinely
resolves from the zip, not the repo checkout."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def find_spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        if os.path.exists(cand):
            return cand
    except ImportError:
        pass
    return None


def test_spark_submit_py_files(tmp_path):
    submit = find_spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this host")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_submit_zip import build

    zip_path = build(str(tmp_path / "blink_spark.zip"))
    out_dir = str(tmp_path / "er_out")
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "blink_spark", "cli.py"),
            "--synthetic-entities", "60",
            "--hot-family", "20",
            "--output", out_dir,
            "--eval-gold",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # neutral cwd: repo not importable from here
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["pairwise"]["f1"] == 1.0
    assert result["cc"]["iterations"] >= 1
    # the submitted --master must win: the session must NOT override
    # it with its own local[N] (the CLI reports the live master)
    assert result["master"] == "local[4]", result.get("master")
    assert os.path.exists(os.path.join(out_dir, "s3_clusters", "_SUCCESS"))
