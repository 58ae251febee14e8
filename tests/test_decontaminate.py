"""Benchmark decontamination (train/test overlap scrub)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_validator_spark.operators.decontaminate import (
    benchmark_ngrams,
    contamination_report,
    decontaminate,
)

BENCH_SENT = "alpha bravo charlie delta echo foxtrot golf"


def _frames(spark):
    docs = spark.createDataFrame(
        [
            # contains the benchmark sentence verbatim mid-document
            (1, "intro words then " + BENCH_SENT + " trailing tail here"),
            # shares only a 4-gram prefix -> NOT contaminated at n=5
            (2, "alpha bravo charlie delta xray yankee zulu mike november"),
            # clean
            (3, "completely unrelated content about spark shuffles only"),
            # shorter than n tokens -> zero grams, never contaminated
            (4, "tiny doc"),
            # case/whitespace normalization must not hide the overlap
            (5, "X  Alpha   BRAVO charlie delta ECHO foxtrot golf  Y"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(BENCH_SENT,)], "text string")
    return docs, bench


def test_contamination_report_semantics(spark):
    docs, bench = _frames(spark)
    rep = {
        r.doc_id: r
        for r in contamination_report(docs, bench, n=5).collect()
    }
    assert rep[1].contaminated and rep[1].n_matched == 3  # 7 tokens -> 3 grams
    assert not rep[2].contaminated and rep[2].n_matched == 0
    assert not rep[3].contaminated
    assert rep[4].n_grams == 0 and not rep[4].contaminated
    assert rep[5].contaminated  # normalization-insensitive
    assert rep[1].containment == round(3 / rep[1].n_grams, 6)


def test_decontaminate_removes_only_flagged(spark):
    docs, bench = _frames(spark)
    kept = sorted(
        r.doc_id for r in decontaminate(docs, bench, n=5).collect()
    )
    assert kept == [2, 3, 4]


def test_benchmark_ngrams_distinct_hashes(spark):
    _, bench = _frames(spark)
    rows = benchmark_ngrams(bench, n=5).collect()
    assert len(rows) == 3  # 7 tokens -> 3 distinct 5-grams
    assert len({r.gram_h for r in rows}) == 3
    assert all(len(r.gram_h) == 32 for r in rows)


def test_benchmark_side_broadcast_plan(spark):
    """The benchmark gram set must reach the join as a broadcast —
    the corpus-side gram stream never shuffles for the semi-join."""
    docs, bench = _frames(spark)
    rep = contamination_report(docs, bench, n=5)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan
