#!/usr/bin/env python
"""Text-dedup scale bench: minhash-LSH candidates + connected-component
clusters over a synthetic corpus with Zipf-skewed near-dup clusters —
including one mega-cluster (2% of the corpus near-copies of ONE doc)
that lands every member in the same LSH buckets, the exact straggler
case skew.salted_self_join chunk-splits.

Corpus (deterministic, per-row hash streams like fixtures/clips.py):
  - i % 50 == 0        -> near-copy of the single "mega" base doc
  - i % 50 in {1,2,3}  -> near-copy of a per-250-block base (clusters ~15)
  - otherwise          -> unique doc
Each near-copy perturbs one word position, so pairs sit at jaccard
~0.9 (real near-dups, not byte-identical).

Usage: python tools/dedup_bench.py [--rows 200000] [--cap 2000]
Prints one JSON line with per-stage wall times + cluster counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pandas as pd


def synth_docs(spark, n_rows: int):
    words = np.array([f"w{i:04d}" for i in range(5000)])

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            out_ids, out_txt = [], []
            for i in idx:
                m = i % 50
                if m == 0:
                    base_seed = 777
                elif m in (1, 2, 3):
                    base_seed = 10_000 + (i // 250)
                else:
                    base_seed = 1_000_000 + i
                rng = np.random.RandomState(base_seed)
                toks = list(words[rng.randint(0, len(words), size=40)])
                if m in (0, 1, 2, 3):  # perturb one position per member
                    pos = int(i % len(toks))
                    toks[pos] = f"uniq{i}"
                out_ids.append(int(i))
                out_txt.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": out_ids, "text": out_txt})

    return spark.range(0, n_rows, numPartitions=32).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--cap", type=int, default=2000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from data_validator_spark.operators.graph import dedup_clusters
    from data_validator_spark.operators.text_dedup import (
        minhash_lsh_candidates,
        shingles,
    )
    from data_validator_spark.session import build_session

    spark = build_session(
        app_name="dedup_bench",
        cores=args.cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # materialize the synthetic corpus OUTSIDE the timed region (the
    # benchmark measures dedup, not python-side text synthesis)
    docs = synth_docs(spark, args.rows).persist()
    docs.count()

    t0 = time.monotonic()
    sh = shingles(docs, "doc_id", "text", n=3).persist()
    n_docs = sh.count()
    t_shingle = time.monotonic() - t0

    t0 = time.monotonic()
    cand = minhash_lsh_candidates(
        docs, "doc_id", "text", n_hashes=32, bands=16,
        bucket_cap=args.cap, shingled=sh,
    ).persist()
    n_cand = cand.count()
    t_cand = time.monotonic() - t0

    from pyspark.sql import functions as F

    # true near-dup pairs sit at jaccard ~0.85 and random pairs near 0,
    # so 0.65 cleanly separates them. NOTE: est_jaccard noise is
    # CORRELATED per doc (one unlucky 32-hash signature lowers every
    # pair estimate of that doc by the same amount — observed: one doc
    # in 4000 capped at 22/32 = 0.6875), so the margin must cover the
    # per-doc tail, not just the per-pair sd; production pipelines
    # verify borderline candidates with exact jaccard instead
    # (ngram_jaccard_pairs does).
    verified = cand.filter(F.col("est_jaccard") >= 0.65)
    t0 = time.monotonic()
    clusters = dedup_clusters(verified, "id_a", "id_b").persist()
    n_members = clusters.count()
    n_comp = clusters.filter(F.col("is_keeper")).count()
    biggest = (
        clusters.groupBy("component").count().agg(F.max("count")).collect()[0][0]
    )
    t_cc = time.monotonic() - t0

    exp_mega = args.rows // 50
    print(
        json.dumps(
            {
                "rows": args.rows,
                "bucket_cap": args.cap,
                "n_docs_shingled": n_docs,
                "sec_shingle": round(t_shingle, 2),
                "n_candidate_pairs": n_cand,
                "sec_candidates": round(t_cand, 2),
                "n_clustered_members": n_members,
                "n_components": n_comp,
                "biggest_component": biggest,
                "expected_mega_size": exp_mega,
                "mega_recovered": bool(biggest == exp_mega),
                "sec_clusters": round(t_cc, 2),
                "docs_per_sec_end_to_end": round(
                    args.rows / (t_shingle + t_cand + t_cc), 1
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
