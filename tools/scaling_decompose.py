#!/usr/bin/env python
"""Fixed-vs-scaling cost decomposition for the clips-validation pass
(round-5 verdict task 1: efficiency fell 1.019 -> 0.844 as per-clip
python decode got cheaper and fixed JVM costs surfaced — find them).

Runs ONE warm validation pass (after a discarded cold pass) at a given
core count with the pipeline's actions SEQUENTIAL and individually
timed, and samples the whole process tree's CPU seconds (JVM + python
workers, /proc utime+stime) at each phase boundary. For each phase:

    wall  = elapsed wall-clock
    cpu   = process-tree CPU consumed during the phase
    util  = cpu / (wall * cores)   -- 1.0 = perfectly parallel

Run it at two core counts (pinned with taskset, like scaling_bench)
and fit Amdahl per phase: wall_c = serial + parallel/c gives
    serial  = (4*wall_8 - wall_2) / 3      (for c in {2, 8})
    parallel = 8 * (wall_2 - wall_8) / 3

Usage:
    taskset -c 0-1 python tools/scaling_decompose.py --cores 2 \
        --clips-dir /tmp/scaling_clips_100k --rows 100000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_cpu_seconds() -> float:
    """Sum utime+stime (seconds) over this process and every
    descendant via /proc — catches the JVM and forked python workers."""
    tick = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    # build pid -> ppid map once per call
    pids = [int(d) for d in os.listdir("/proc") if d.isdigit()]
    ppid = {}
    stat = {}
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                raw = f.read().decode("ascii", "replace")
        except OSError:
            continue
        # comm may contain spaces/parens: split after the LAST ')'
        rest = raw[raw.rindex(")") + 2 :].split()
        ppid[pid] = int(rest[1])
        stat[pid] = (int(rest[11]), int(rest[12]))  # utime, stime
    tree = {me}
    grew = True
    while grew:
        grew = False
        for pid, pp in ppid.items():
            if pp in tree and pid not in tree:
                tree.add(pid)
                grew = True
    total = sum(
        stat[pid][0] + stat[pid][1] for pid in tree if pid in stat
    )
    return total / tick


def run_pass(spark, paths, seq: bool) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from data_validator_spark.plans import ValidationConfig, run_validation

    phases: list[tuple[str, float, float]] = []
    t_all0 = time.monotonic()
    c_all0 = tree_cpu_seconds()

    def mark(name, t0, c0):
        phases.append((name, time.monotonic() - t0, tree_cpu_seconds() - c0))

    t0, c0 = time.monotonic(), tree_cpu_seconds()
    clips = spark.read.parquet(paths["clips"])
    tr = spark.read.parquet(paths["transcripts_ref"])
    res = run_validation(clips, tr, cfg=ValidationConfig(persist=True))
    mark("build_plan", t0, c0)

    if seq:
        t0, c0 = time.monotonic(), tree_cpu_seconds()
        n_valid = res.validated.count()
        mark("validated_count(decode+cache)", t0, c0)
        t0, c0 = time.monotonic(), tree_cpu_seconds()
        n_invalid = res.invalid.count()
        mark("invalid_count", t0, c0)
        t0, c0 = time.monotonic(), tree_cpu_seconds()
        verdicts = res.partition_verdicts.collect()
        mark("partition_verdicts", t0, c0)
        t0, c0 = time.monotonic(), tree_cpu_seconds()
        stats_rows = res.summary_stats.collect()
        mark("summary_stats", t0, c0)
        t0, c0 = time.monotonic(), tree_cpu_seconds()
        hist_n = res.histograms.count()
        mark("histograms", t0, c0)
    else:
        from concurrent.futures import ThreadPoolExecutor

        t0, c0 = time.monotonic(), tree_cpu_seconds()
        with ThreadPoolExecutor(max_workers=4) as ex:
            f_stats = ex.submit(lambda: res.summary_stats.collect())
            f_hist = ex.submit(lambda: res.histograms.count())
            n_valid = res.validated.count()
            f_inv = ex.submit(lambda: res.invalid.count())
            verdicts = res.partition_verdicts.collect()
            n_invalid = f_inv.result()
            stats_rows = f_stats.result()
            hist_n = f_hist.result()
        mark("all_actions_concurrent", t0, c0)

    t0, c0 = time.monotonic(), tree_cpu_seconds()
    res.unpersist()
    mark("unpersist", t0, c0)
    wall = time.monotonic() - t_all0
    cpu = tree_cpu_seconds() - c_all0
    return {
        "wall": round(wall, 3),
        "cpu": round(cpu, 3),
        "phases": [
            {"name": n, "wall": round(w, 3), "cpu": round(c, 3)}
            for n, w, c in phases
        ],
        "n_valid": n_valid,
        "n_invalid": n_invalid,
        "n_verdicts": len(verdicts),
        "n_stats": len(stats_rows),
        "n_hist": hist_n,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--clips-dir", required=True)
    ap.add_argument("--rows", type=int, default=100000)
    ap.add_argument("--concurrent", action="store_true",
                    help="time the shipped concurrent-action pass "
                    "instead of the sequential decomposition")
    args = ap.parse_args()

    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[var] = "1"
    os.environ.setdefault("SPARK_DRIVER_MEM", f"{max(8, args.cores)}g")

    import bench

    spark = bench.build(args.cores)
    paths = {
        "clips": os.path.join(args.clips_dir, "clips"),
        "transcripts_ref": os.path.join(args.clips_dir, "transcripts_ref"),
    }
    t0 = time.monotonic()
    cold = run_pass(spark, paths, seq=not args.concurrent)
    cold_wall = time.monotonic() - t0
    warm = run_pass(spark, paths, seq=not args.concurrent)
    out = {
        "cores": args.cores,
        "rows": args.rows,
        "mode": "concurrent" if args.concurrent else "sequential",
        "cold_wall": round(cold_wall, 3),
        "warm": warm,
        "clips_per_sec_warm": round(args.rows / warm["wall"], 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
