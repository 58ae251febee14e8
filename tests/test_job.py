"""spark-submit job entry point: payload-driven resumable run."""

from __future__ import annotations

import json
import sys

import job


def _run(payload_path: str, capsys) -> dict:
    old = sys.argv
    sys.argv = ["job.py", "--payload", payload_path]
    try:
        assert job.main() == 0
    finally:
        sys.argv = old
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out_lines[-1])


def test_job_runs_and_resumes(spark, fixture_paths, tmp_path, capsys):
    out = str(tmp_path / "out")
    payload = {
        "clips_path": fixture_paths["clips"],
        "transcripts_ref_path": fixture_paths["transcripts_ref"],
        "output_dir": out,
        "manifest_path": str(tmp_path / "manifest"),
    }
    p = tmp_path / "payload.json"
    p.write_text(json.dumps(payload))

    r1 = _run(str(p), capsys)
    assert r1["status"] == "ok" and r1["partitions"] > 0
    assert spark.read.parquet(f"{out}/validated").count() == r1["validated_rows"]
    assert spark.read.parquet(f"{out}/invalid").count() > 0
    assert spark.read.parquet(f"{out}/stats").count() > 0

    # second run: manifest says everything is validated -> no-op
    r2 = _run(str(p), capsys)
    assert r2 == {"status": "up_to_date", "partitions": 0}
