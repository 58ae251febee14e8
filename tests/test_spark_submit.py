"""REAL `spark-submit --py-files engine.zip` evidence (the north
rule's packaging requirement): the job is submitted as a subprocess
to a local-cluster master — separate executor JVMs with their own
python workers — so data_validator_spark must resolve from the
shipped zip inside every executor (the repo dir is NOT on the
executors' sys.path; PYTHONPATH is scrubbed from the child env).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyspark


def _spark_submit() -> str:
    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_local_cluster(fixture_paths, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "engine.zip"))

    out = str(tmp_path / "out")
    payload = {
        "clips_path": fixture_paths["clips"],
        "transcripts_ref_path": fixture_paths["transcripts_ref"],
        "output_dir": out,
        "manifest_path": str(tmp_path / "manifest"),
    }
    ppath = tmp_path / "payload.json"
    ppath.write_text(json.dumps(payload))

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    # run from a neutral cwd so `data_validator_spark/` in the repo
    # cannot shadow the zip on the driver either
    res = subprocess.run(
        [
            _spark_submit(),
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(repo, "job.py"),
            "--payload", str(ppath),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
    assert lines, res.stdout[-2000:]
    summary = json.loads(lines[-1])
    assert summary["status"] == "ok"
    assert summary["partitions"] > 0
    assert summary["validated_rows"] > 0
    assert os.path.isdir(os.path.join(out, "validated"))
