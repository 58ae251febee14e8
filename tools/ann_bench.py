#!/usr/bin/env python
"""ANN recall/cost bench: multi-band hyperplane LSH vs IVF vs exact
brute force on a synthetic embedding corpus with planted clustered
structure (what real embedding spaces have — LSH/IVF on *uniform*
random vectors is a known worst case and tells you nothing).

Corpus: n_clusters Gaussian blobs in dim-D (cluster std 0.15 around
unit-norm centers), queries are the first n_queries corpus vectors.
Recall@k is measured against exact brute force; candidate volume is
the real cost driver (how many cosines each method scores).

Usage: python tools/ann_bench.py [--rows 100000] [--dim 64] [--k 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pandas as pd


def synth_embeddings(spark, n_rows: int, dim: int, noise: float, n_clusters: int = 200):
    centers = np.random.RandomState(1).standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rng = np.random.RandomState(90210)
            # per-row determinism: derive each row's noise from its index
            out = []
            for i in idx:
                c = centers[int(i) % n_clusters]
                r = np.random.RandomState(int(i) + 7)
                v = c + noise * r.standard_normal(dim)
                out.append(v.astype(np.float32))
            _ = rng  # (kept: explicit about the single stream not used)
            yield pd.DataFrame({"vec_id": idx, "embedding": [list(v) for v in out]})

    return spark.range(0, n_rows, numPartitions=32).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--noise", type=float, default=0.05,
                    help="cluster std: 0.05 -> cluster-mates at cos~0.9 (the near-dup regime LSH is built for); 0.15 -> cos~0.4 (diffuse, LSH-hostile)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_validator_spark.operators import similarity as sim
    from data_validator_spark.session import build_session

    spark = build_session(
        app_name="ann_bench",
        cores=args.cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    corpus = synth_embeddings(spark, args.rows, args.dim, args.noise).persist()
    corpus.count()
    q = corpus.filter(F.col("vec_id") < args.queries)

    def run(name, fn):
        t0 = time.monotonic()
        rows = fn().collect()
        sec = round(time.monotonic() - t0, 2)
        return {(r.query_id, r.neighbor_id) for r in rows}, sec

    bf, sec_bf = run("bf", lambda: sim.brute_force_topk(corpus, q, k=args.k))
    lsh, sec_lsh = run(
        "lsh",
        lambda: sim.lsh_topk(
            corpus, q, dim=args.dim, k=args.k, n_planes=8, n_bands=12
        ),
    )
    ivf, sec_ivf = run(
        "ivf",
        lambda: sim.ivf_topk(
            corpus, q, dim=args.dim, k=args.k, n_cells=64, nprobe=8
        ),
    )
    print(
        json.dumps(
            {
                "rows": args.rows,
                "dim": args.dim,
                "k": args.k,
                "n_queries": args.queries,
                "cluster_noise": args.noise,
                "bf_sec": sec_bf,
                "lsh_sec": sec_lsh,
                "lsh_recall": round(len(bf & lsh) / len(bf), 4),
                "ivf_sec": sec_ivf,
                "ivf_recall": round(len(bf & ivf) / len(bf), 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
