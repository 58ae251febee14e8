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

    from data_validator_spark.operators.text_dedup import dedup_pipeline
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

    from pyspark.sql import functions as F

    # drive the SHIPPED composition (text_dedup.dedup_pipeline): exact
    # tier -> one persisted shingle pass -> minhash-LSH candidates ->
    # EXACT-jaccard verification -> star-contraction clusters -> keeper
    # list. est_margin generous because signature noise is CORRELATED
    # per doc (one unlucky 32-hash signature lowers every estimate of
    # that doc); the exact verify makes the final call either way.
    t0 = time.monotonic()
    res = dedup_pipeline(
        docs, "doc_id", "text", n=3, n_hashes=32, bands=16,
        threshold=0.8, bucket_cap=args.cap, est_margin=0.3,
    )
    keep = res.keepers.persist()
    n_docs = keep.count()
    n_keep = keep.filter(F.col("is_keeper")).count()
    t_pipeline = time.monotonic() - t0

    t0 = time.monotonic()
    n_cand = res.candidate_pairs.count()
    n_verified = res.verified_pairs.count()
    t_pairs = time.monotonic() - t0
    comp_sizes = (
        keep.groupBy("component").count().agg(F.max("count")).collect()[0][0]
    )

    exp_mega = args.rows // 50
    print(
        json.dumps(
            {
                "rows": args.rows,
                "bucket_cap": args.cap,
                "n_docs": n_docs,
                "n_keepers": n_keep,
                "n_dropped": n_docs - n_keep,
                "n_candidate_pairs": n_cand,
                "n_verified_pairs": n_verified,
                "biggest_component": comp_sizes,
                "expected_mega_size": exp_mega,
                # the straggler gate: the 4,000-member Zipf mega-cluster
                # (every member in the same LSH buckets) must come back
                # intact THROUGH the chunk-split join, not as fragments
                "mega_recovered": bool(comp_sizes == exp_mega),
                "sec_pipeline": round(t_pipeline, 2),
                "sec_pair_recount": round(t_pairs, 2),
                "docs_per_sec_end_to_end": round(args.rows / t_pipeline, 1),
            }
        )
    )
    res.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
