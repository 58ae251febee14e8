#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json):
"throughput scaling efficiency >= 0.8 from N to 4N executors".

No real cluster exists in the sandbox, so per the driver instructions
the same job (full clips validation: hard tier, soft rules, dedup,
referential winner-selection, audio decode + SNR>=30dB, verdicts,
stats) runs at two parallelism levels — local[8] (N) and local[32]
(4N) — over the IDENTICAL pre-materialized parquet input, and we
report throughput at both plus efficiency = T_4N / (4 * T_N).

Each level runs in its own subprocess (one SparkSession per process)
via `bench.py --clips-only --clips-dir ...`. BLAS/numpy threading is
pinned to 1 so the only parallelism under test is Spark's task
scheduling. Results land in BENCH.md (and the caller folds them into
BASELINE.md).

Usage: python tools/scaling_bench.py [--rows 60000] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, rows: int, clips_dir: str, repeats: int) -> dict:
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        env[var] = "1"
    # emulate per-executor memory: a cluster of 4N executors brings 4x
    # the heap of N executors, so the local[4N] JVM gets 4x the heap of
    # local[N] (1 GiB per core, like a real executor sizing); a fixed
    # shared heap would bottleneck the 4N level on GC, which no real
    # cluster experiences
    env["SPARK_DRIVER_MEM"] = f"{max(8, cores)}g"
    # pin the WHOLE process tree (JVM + python workers) to `cores`
    # physical cores: unpinned local[N] offloads GC/serialization onto
    # the idle cores of the box — capacity an N-core executor cluster
    # does not have — which overstates the N-level throughput
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "bench.py", "--clips-only",
         "--cores", str(cores), "--rows", str(rows),
         "--repeats", str(repeats), "--clips-dir", clips_dir],
        cwd=REPO, env=env, capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    res = json.loads(line)
    print(f"  local[{cores}]: best of {repeats}: "
          f"{res['clips_per_sec']} clips/s ({res['clips_sec']}s)",
          file=sys.stderr, flush=True)
    return res


def materialize(rows: int, max_synth_ms: int, out_dir: str) -> None:
    # 32 concurrent writers buffer a parquet row group of `bytes` rows
    # each — needs a roomy heap and small row groups or the write OOMs
    code = (
        "import bench; s = bench.build(32); "
        "s.sparkContext._jsc.hadoopConfiguration()"
        ".setInt('parquet.block.size', 16 * 1024 * 1024); "
        f"bench.materialize_clips(s, {rows}, {max_synth_ms}, {out_dir!r}); "
        "s.stop()"
    )
    env = dict(os.environ, SPARK_DRIVER_MEM="24g")
    subprocess.run([sys.executable, "-c", code], cwd=REPO, check=True,
                   env=env, stdout=subprocess.DEVNULL)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=250000)
    ap.add_argument("--max-synth-ms", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--n4", type=int, default=8)
    ap.add_argument("--clips-dir", default=None,
                    help="reuse an existing fixture dir (skips materialize + cleanup)")
    args = ap.parse_args()

    tmp = args.clips_dir or tempfile.mkdtemp(prefix="scaling_clips_")
    try:
        if not args.clips_dir:
            print(f"materializing {args.rows} clips once -> {tmp}", file=sys.stderr)
            materialize(args.rows, args.max_synth_ms, tmp)

        lo = run_level(args.n, args.rows, tmp, args.repeats)
        hi = run_level(args.n4, args.rows, tmp, args.repeats)
    finally:
        if not args.clips_dir:
            shutil.rmtree(tmp, ignore_errors=True)

    t_n, t_4n = lo["clips_per_sec"], hi["clips_per_sec"]
    eff = t_4n / (4.0 * t_n)
    summary = {
        "rows": args.rows,
        "n_cores": args.n,
        "n4_cores": args.n4,
        "throughput_n": t_n,
        "throughput_4n": t_4n,
        "sec_n": lo["clips_sec"],
        "sec_4n": hi["clips_sec"],
        "scaling_efficiency": round(eff, 3),
        "meets_0.8": eff >= 0.8,
    }
    print(json.dumps(summary))

    # raw protocol evidence lands in BENCH_scaling.json (appended per
    # run); BENCH.md is hand-maintained so one tool run can't clobber
    # the decomposition/curve narrative around the headline number
    out_path = os.path.join(REPO, "BENCH_scaling.json")
    try:
        with open(out_path) as f:
            hist = json.load(f)
    except (OSError, ValueError):
        hist = []
    hist.append(summary)
    with open(out_path, "w") as f:
        json.dump(hist, f, indent=1)
        f.write("\n")
    print(f"appended -> {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
