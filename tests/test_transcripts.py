"""Word-level WER operator (operators/transcripts.py): exactness vs a
pure-python DP reference, vocab-path/general-path agreement, null and
empty-string semantics, and the wer_label soft-tier contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_validator_spark.operators.transcripts import (
    wer_label,
    word_error_rate,
)

VOCAB = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]


def _py_word_lev(a: list[str], b: list[str]) -> int:
    """Textbook O(n*m) reference DP."""
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, wb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (wa != wb),
            )
        prev = cur
    return prev[len(b)]


def _random_pairs(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        la = rng.randint(0, 12)
        lb = rng.randint(0, 12)
        a = " ".join(rng.choice(VOCAB) for _ in range(la))
        b = " ".join(rng.choice(VOCAB) for _ in range(lb))
        out.append((a, b))
    return out


@pytest.mark.parametrize("vocab", [None, VOCAB])
def test_wer_matches_python_dp(spark, vocab):
    pairs = _random_pairs(120, seed=7)
    df = spark.createDataFrame(
        [Row(i=i, hyp=h, ref=r) for i, (h, r) in enumerate(pairs)]
    )
    got = {
        row["i"]: (row["wer_distance"], row["wer_ref_words"], row["wer"])
        for row in word_error_rate(df, "hyp", "ref", vocab=vocab).collect()
    }
    for i, (h, r) in enumerate(pairs):
        ht, rt = h.split(), r.split()
        dist = _py_word_lev(ht, rt)
        assert got[i][0] == dist, (i, h, r)
        assert got[i][1] == len(rt)
        assert got[i][2] == pytest.approx(dist / max(len(rt), 1))


def test_wer_null_and_whitespace_semantics(spark):
    df = spark.createDataFrame(
        [
            Row(i=1, hyp=None, ref="alpha"),
            Row(i=2, hyp="alpha", ref=None),
            Row(i=3, hyp="  alpha   bravo ", ref="alpha bravo"),
            Row(i=4, hyp="", ref=""),
            Row(i=5, hyp="alpha bravo", ref=""),
        ]
    )
    got = {
        r["i"]: (r["wer_distance"], r["wer"])
        for r in word_error_rate(df, "hyp", "ref").collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[3] == (0, 0.0)  # whitespace-insensitive tokenization
    assert got[4] == (0, 0.0)  # both empty
    assert got[5] == (2, 2.0)  # insertions / max(ref, 1)


def test_vocab_path_unk_collapse(spark):
    """Documented vocab-path semantics: two DIFFERENT OOV words both
    map to <unk> and compare equal; the general path keeps them
    distinct."""
    df = spark.createDataFrame([Row(i=1, hyp="zz1 alpha", ref="zz2 alpha")])
    v = word_error_rate(df, "hyp", "ref", vocab=VOCAB).collect()[0]
    g = word_error_rate(df, "hyp", "ref").collect()[0]
    assert v["wer_distance"] == 0
    assert g["wer_distance"] == 1


def test_wer_label_echoes_value(spark):
    df = word_error_rate(
        spark.createDataFrame(
            [
                Row(i=1, hyp="alpha bravo charlie delta", ref="alpha bravo charlie delta"),
                Row(i=2, hyp="alpha x y z", ref="alpha bravo charlie delta"),
                Row(i=3, hyp=None, ref="alpha"),
            ]
        ),
        "hyp",
        "ref",
    ).withColumn("lab", wer_label(F.col("wer"), max_wer=0.25))
    got = {r["i"]: r["lab"] for r in df.collect()}
    assert got[1] is None
    assert got[2] == "transcript_wer_above(0.75)"
    assert got[3] is None  # null wer never labels


def test_tokenizer_parity_unicode_whitespace(spark):
    """Both paths tokenize with Java's \\s class: U+00A0 (NBSP) is NOT
    a separator in either, so the same row yields the same WER whether
    or not a vocab is passed (round-5 ADVICE: the general path used
    python str.split(), which also splits on Unicode whitespace)."""
    nbsp = "alpha\u00a0bravo"  # ONE token under Java \s+
    df = spark.createDataFrame(
        [Row(i=1, hyp=nbsp, ref="alpha bravo"), Row(i=2, hyp=nbsp, ref=nbsp)]
    )
    gen = {
        r["i"]: (r["wer_distance"], r["wer_ref_words"])
        for r in word_error_rate(df, "hyp", "ref").collect()
    }
    voc = {
        r["i"]: (r["wer_distance"], r["wer_ref_words"])
        for r in word_error_rate(
            df, "hyp", "ref", vocab=VOCAB + [nbsp]
        ).collect()
    }
    assert gen == voc
    # the NBSP-joined pair is one token vs two -> substitution+deletion
    assert gen[1] == (2, 2)
    assert gen[2] == (0, 1)
