"""Substring-level exact dedup (ExactSubstr, Lee et al. 2022) —
planted-passage tests: flagged spans must exactly match the plants.

Reference parity: the reference has no substring dedup (its dedup is
row-level winner-selection, survey_prep.py); this is the
training-pipeline tier next to minhash/simhash/winnowing.
"""

from __future__ import annotations

import pytest

from data_validator_spark.operators.text_dedup import exact_substring_spans

# a 50-token passage, shared verbatim between otherwise-distinct docs
PASSAGE = " ".join(f"tok{i}" for i in range(50))


def _spans(spark, rows, k, keep_first=True):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = exact_substring_spans(df, "doc_id", "text", k=k, keep_first=keep_first)
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in out.collect()
    )


def test_planted_passage_spans_exact(spark):
    # d1 owns the corpus-first copy (kept); d2/d3 embed it at known
    # token offsets — the cut spans must be exactly the passage.
    rows = [
        ("d1", PASSAGE + " epilogue words here"),
        ("d2", "three unique prefix " + PASSAGE),
        ("d3", "one " + PASSAGE + " trailing tail tokens"),
        ("d4", "entirely unrelated document with no shared fifty token run"),
    ]
    got = _spans(spark, rows, k=50)
    assert got == [("d2", 3, 53, 50), ("d3", 1, 51, 50)]


def test_keep_first_false_marks_all_copies(spark):
    rows = [("d1", PASSAGE), ("d2", PASSAGE)]
    got = _spans(spark, rows, k=50, keep_first=False)
    assert got == [("d1", 0, 50, 50), ("d2", 0, 50, 50)]


def test_within_doc_repeat_two_runs(spark):
    # the same doc repeats the passage; gap (1 separator token) > 0
    # but spans [0,50) and [51,101) are disjoint (gap 51 > k) -> two runs
    rows = [("d1", PASSAGE + " sep " + PASSAGE)]
    got = _spans(spark, rows, k=50, keep_first=False)
    assert got == [("d1", 0, 50, 50), ("d1", 51, 101, 50)]
    # keep_first exempts only the first copy
    got2 = _spans(spark, rows, k=50, keep_first=True)
    assert got2 == [("d1", 51, 101, 50)]


def test_longer_shared_run_merges_to_one_span(spark):
    # 60 shared tokens -> 11 overlapping 50-grams -> ONE maximal span
    long_p = " ".join(f"tok{i}" for i in range(60))
    rows = [("d1", long_p), ("d2", "x y " + long_p + " z")]
    got = _spans(spark, rows, k=50)
    assert got == [("d2", 2, 62, 60)]


def test_docs_shorter_than_k_are_ignored(spark):
    rows = [("d1", "short doc"), ("d2", "short doc")]
    assert _spans(spark, rows, k=50) == []


def test_normalization_case_and_whitespace(spark):
    # mixed case + runs of whitespace still match verbatim tokens
    rows = [
        ("d1", PASSAGE),
        ("d2", "  " + PASSAGE.upper().replace(" ", "   ") + " "),
    ]
    got = _spans(spark, rows, k=50, keep_first=False)
    assert got == [("d1", 0, 50, 50), ("d2", 0, 50, 50)]


def test_overlapping_plants_union_merge(spark):
    # two plants overlapping within one doc (gap <= k) merge into one
    # cut span: positions 0 and 30 with k=50 -> union [0, 80)
    p80 = " ".join(f"tok{i}" for i in range(80))
    d_sub1 = " ".join(f"tok{i}" for i in range(50))          # pos 0 plant
    d_sub2 = " ".join(f"tok{i}" for i in range(30, 80))      # pos 30 plant
    rows = [("d1", d_sub1), ("d2", d_sub2), ("d3", p80)]
    got = _spans(spark, rows, k=50)
    # d3 holds later copies of both plants (d1/d2 are first) -> its
    # duplicated 50-grams at pos 0 and 30 merge into [0, 80)
    assert got == [("d3", 0, 80, 80)]
