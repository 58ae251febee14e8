#!/usr/bin/env python
"""One-command round gate: pytest + the DuckDB oracle suite at two
scale factors + the clips bench, with a single JSON summary line at
the end. What the per-round driver effectively measures, runnable
locally before committing.

Usage: python tools/round_check.py [--skip-bench]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

REPO = __file__.rsplit("/", 2)[0]


def run(cmd: list[str]) -> tuple[int, str]:
    t0 = time.monotonic()
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sec = round(time.monotonic() - t0, 1)
    print(f"$ {' '.join(cmd)}  -> rc={p.returncode} ({sec}s)", file=sys.stderr)
    return p.returncode, p.stdout + p.stderr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--sf01", action="store_true",
                    help="also run the oracle suite at sf0.1")
    args = ap.parse_args()

    summary: dict = {}

    rc, out = run([sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    last = [l for l in out.splitlines() if "passed" in l or "failed" in l]
    summary["pytest"] = {"rc": rc, "tail": last[-1].strip() if last else ""}

    sfs = ("sf0.001", "sf0.01", "sf0.1") if args.sf01 else ("sf0.001", "sf0.01")
    for sf in sfs:
        rc, out = run(
            [sys.executable, "tools/check_oracles.py", f"/root/testdata/{sf}"]
        )
        tally = [l for l in out.splitlines() if "pass," in l]
        summary[f"oracles_{sf}"] = {
            "rc": rc,
            "tally": tally[-1].strip() if tally else "",
        }

    if not args.skip_bench:
        rc, out = run([sys.executable, "bench.py", "--clips-only", "--repeats", "2"])
        line = [l for l in out.splitlines() if l.startswith("{")]
        if line:
            b = json.loads(line[-1])
            summary["bench"] = {
                "rc": rc,
                "clips_per_sec": b.get("clips_per_sec"),
                "clips_per_sec_cold": b.get("clips_per_sec_cold"),
                "clips_per_sec_warm": b.get("clips_per_sec_warm"),
            }

    ok = all(v.get("rc") == 0 for v in summary.values())
    summary["ok"] = ok
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
