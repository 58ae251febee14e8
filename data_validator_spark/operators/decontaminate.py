"""Benchmark decontamination: flag training documents that contain
n-grams from a held-out evaluation/benchmark set — the standard
train/test overlap scrub (13-gram containment, the GPT-3 appendix-C
procedure) every corpus must run before evaluation numbers mean
anything.

Reference parity: the reference validates rows against CATALOG tables
(allowed-task joins, plans/validation.py J5); decontamination is the
content-level analogue — membership of a document's n-grams in a
reference set instead of membership of a key in a dimension.

Scale design (the part that matters at 10^12 tokens):
  * The benchmark side is distinct-deduped and md5-hashed ONCE; it is
    small by construction (eval sets are thousands of documents, not
    billions), so it is broadcast — the corpus-side gram stream joins
    against an in-memory hash set on every executor and NEVER
    shuffles. `broadcast_bench=False` falls back to a shuffled join
    for a pathologically large reference set.
  * The corpus side explodes each document's DISTINCT n-grams
    (array_distinct before explode bounds fanout at one row per
    distinct gram) and carries only (doc_id, 32-char md5) — the
    document text never leaves the scan.
  * The per-doc verdict is one groupBy(doc_id) over the semi-joined
    gram stream; everything downstream of the explode carries
    scalars.

md5 is used (not xxhash64) because it exists verbatim in DuckDB, so
the oracle replays the exact hash-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_spark.operators.text import word_ngrams

DEFAULT_NGRAM = 13


def benchmark_ngrams(
    bench: DataFrame,
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Distinct md5-hashed n-grams of the benchmark set: one column
    `gram_h`. Computed once; callers broadcast it."""
    return (
        bench.select(
            F.explode(
                F.array_distinct(word_ngrams(F.col(text_col), n))
            ).alias("g")
        )
        .select(F.md5(F.col("g")).alias("gram_h"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    min_matches: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """-> (id_col, n_grams, n_matched, containment, contaminated):
    per-document distinct-n-gram counts, how many appear in the
    benchmark set, their ratio, and the verdict (`n_matched >=
    min_matches`; the standard policy is min_matches=1 — ANY shared
    13-gram is contamination). Documents shorter than n tokens have
    n_grams=0, containment 0.0, and are never contaminated."""
    ref = benchmark_ngrams(bench, bench_text_col, n)
    if broadcast_bench:
        ref = F.broadcast(ref)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_ngrams(F.col(text_col), n))
        ).alias("g"),
    ).select(F.col(id_col), F.md5(F.col("g")).alias("gram_h"))
    matched = (
        doc_grams.join(ref, "gram_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    )
    totals = doc_grams.groupBy(id_col).agg(
        F.sum(F.col("gram_h").isNotNull().cast("long")).alias("n_grams")
    )
    out = totals.join(matched, id_col, "left").select(
        F.col(id_col),
        F.col("n_grams"),
        F.coalesce(F.col("n_matched"), F.lit(0)).alias("n_matched"),
        F.round(
            F.coalesce(F.col("n_matched"), F.lit(0))
            / F.greatest(F.col("n_grams"), F.lit(1)),
            6,
        ).alias("containment"),
        (
            F.coalesce(F.col("n_matched"), F.lit(0)) >= F.lit(min_matches)
        ).alias("contaminated"),
    )
    return out


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    min_matches: int = 1,
) -> DataFrame:
    """Docs with contaminated rows REMOVED — the pre-training scrub.
    One left-anti join against the flagged id set."""
    flagged = contamination_report(
        docs, bench, id_col, text_col, bench_text_col, n, min_matches
    ).filter(F.col("contaminated"))
    return docs.join(flagged.select(id_col), id_col, "left_anti")
