"""Text analysis / dedup / similarity / sampling / multimodal operators."""

import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators import sampling, similarity, text, text_dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and the dog barked at the cat loudly"),
        (2, "the cat sat on the mat and the dog barked at the cat quietly"),  # near-dup of 1
        (3, "el perro corre por la calle y el gato duerme en la casa"),
        (4, "der hund läuft und die katze schläft in der nacht nicht"),
        (5, "completely different words here about spark query engines"),
        (6, "the cat sat on the mat and the dog barked at the cat loudly"),  # exact dup of 1
        (7, ""),
        (8, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count_and_fingerprint(spark, docs):
    out = docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n"),
        text.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n == 14
    assert by_id[7].n == 0
    assert by_id[1].fp == by_id[6].fp
    assert by_id[1].fp != by_id[2].fp


def test_lang_id(spark, docs):
    out = {
        r.doc_id: r.lang
        for r in docs.filter(F.col("text").isNotNull()).select(
            "doc_id", text.lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert out[1] == "en" and out[6] == "en"
    assert out[3] == "es"
    assert out[4] == "de"
    assert out[7] == "und"


def test_quality_score_bounds(spark, docs):
    scored = text.quality_score(docs.filter(F.col("text").isNotNull()))
    rows = scored.select("doc_id", "quality_score").collect()
    assert all(0.0 <= r.quality_score <= 1.0 for r in rows)
    by_id = {r.doc_id: r.quality_score for r in rows}
    assert by_id[1] > by_id[7]  # real sentence beats empty


def test_exact_duplicates(spark, docs):
    dups = text_dedup.exact_duplicates(docs.filter(F.col("text").isNotNull()), "doc_id", "text").collect()
    assert len(dups) == 1
    assert dups[0].keep_id == 1 and dups[0].dup_id == 6


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = text_dedup.ngram_jaccard_pairs(
        docs.filter(F.col("text").isNotNull()), "doc_id", "text", n=3, threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got  # one-word change
    assert (1, 6) in got  # identical -> jaccard 1.0
    j16 = [r.jaccard for r in pairs if (r.id_a, r.id_b) == (1, 6)][0]
    assert j16 == 1.0


def test_minhash_lsh_recovers_near_dups(spark, docs):
    cand = text_dedup.minhash_lsh_candidates(
        docs.filter(F.col("text").isNotNull()), "doc_id", "text", n_hashes=32, bands=16
    ).collect()
    got = {(r.id_a, r.id_b): r.est_jaccard for r in cand}
    assert (1, 6) in got and got[(1, 6)] == 1.0
    assert (1, 2) in got  # high-jaccard pair collides in some band
    # unrelated docs should not estimate high similarity
    assert got.get((1, 5), 0.0) < 0.3


def test_simhash_identical_and_near(spark, docs):
    # 8 bands of 8 bits -> pigeonhole guarantees a band collision for
    # any pair within hamming distance 7
    cand = text_dedup.simhash_candidates(
        docs.filter(F.col("text").isNotNull()), "doc_id", "text",
        max_hamming=10, n_bands=8,
    ).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in cand}
    assert got.get((1, 6)) == 0  # identical text -> same simhash
    assert got.get((1, 2), 99) <= 10  # near-dup within hamming ball


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(50):
        base = [math.sin(0.1 * i + 0.2 * j) for j in range(8)]
        rows.append((i, base))
    rows.append((100, rows[0][1]))  # exact duplicate of vector 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_exact_dup_is_rank1(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(vectors, q, k=3).collect()
    assert out[0].neighbor_id == 100 and out[0].cos_sim == 1.0 and out[0].rank == 1


def test_lsh_topk_subset_of_brute_force(spark, vectors):
    q = vectors.filter(F.col("vec_id") < 3)
    bf = similarity.brute_force_topk(vectors, q, k=5)
    lsh = similarity.lsh_topk(vectors, q, dim=8, k=5, n_planes=6)
    bf_pairs = {(r.query_id, r.neighbor_id, r.cos_sim) for r in bf.collect()}
    lsh_rows = lsh.collect()
    # every LSH hit is a true neighbor with the same score it would get
    # from brute force (scores identical; rank may differ by recall)
    for r in lsh_rows:
        full = similarity.brute_force_topk(
            vectors, q.filter(F.col("vec_id") == r.query_id), k=100
        ).collect()
        match = [x for x in full if x.neighbor_id == r.neighbor_id]
        assert match and match[0].cos_sim == r.cos_sim


def test_embedding_near_dups(spark, vectors):
    pairs = similarity.embedding_near_dups(vectors, dim=8, threshold=0.999).collect()
    assert {(r.id_a, r.id_b) for r in pairs} >= {(0, 100)}


def test_stratified_quota_exact(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = sampling.stratified_quota_sample(df, "s", {"a": 10, "b": 5}, ["id"])
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 5}
    # deterministic: same pick twice
    out2 = sampling.stratified_quota_sample(df, "s", {"a": 10, "b": 5}, ["id"])
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in out2.collect())


def test_hash_sample_deterministic_fraction(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    s1 = sampling.hash_sample(df, ["k"], 0.10)
    n = s1.count()
    assert 800 < n < 1200  # ~10%
    assert s1.exceptAll(sampling.hash_sample(df, ["k"], 0.10)).count() == 0


def test_exact_random_sample_no_global_sort(spark):
    from data_validator_spark.operators import sampling

    df = spark.range(0, 50_000).withColumn("k", F.col("id") % 7)
    out = sampling.exact_random_sample(df, 200, seed=11)
    rows = out.collect()
    assert len(rows) == 200
    assert out.columns == df.columns  # no helper column leaks
    # deterministic under the same seed; different under another
    again = set(r.id for r in sampling.exact_random_sample(df, 200, seed=11).collect())
    assert set(r.id for r in rows) == again
    other = set(r.id for r in sampling.exact_random_sample(df, 200, seed=12).collect())
    assert again != other
    # roughly uniform across the key space (no partition-prefix bias)
    mean_id = sum(r.id for r in rows) / len(rows)
    assert 15_000 < mean_id < 35_000
    # plan: per-partition top-n merge, never a global range Exchange+Sort
    plan = sampling.exact_random_sample(df, 200, seed=11)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    # n >= total degenerates to the full table
    assert sampling.exact_random_sample(df.limit(50), 200, seed=1).count() == 50


def test_multimodal_sniff_and_stub(spark, clips):
    from data_validator_spark.operators import multimodal

    meta = multimodal.payload_metadata(clips.limit(200))
    fmts = {r.payload_format for r in meta.select("payload_format").distinct().collect()}
    assert "wav" in fmts  # pcm16 RIFF/WAVE magic detected + form-refined
    feats = multimodal.decode_image_features(clips.limit(50), fake=True)
    rows = feats.collect()
    assert all(r.features is None or len(r.features) == 8 for r in rows)
    # real path: audio payloads are not PNGs -> NULL features, no crash
    real = multimodal.decode_image_features(clips.limit(20), fake=False)
    assert all(r.features is None for r in real.collect())


def test_pseudonymize_length_preserving_deterministic(spark):
    import pandas as pd
    import pyspark.sql.functions as F

    from data_validator_spark.functions.scalars import pseudonymize

    df = spark.createDataFrame(
        pd.DataFrame({"v": ["Customer#001", "x", "", None, "Customer#001"]})
    )
    out = df.select("v", pseudonymize(F.col("v"), salt="s").alias("p")).collect()
    by_v = {}
    for r in out:
        if r.v is None:
            assert r.p is None
        else:
            assert len(r.p) == len(r.v)
            by_v.setdefault(r.v, set()).add(r.p)
    # deterministic: same value -> same pseudonym; and it differs from input
    assert all(len(ps) == 1 for ps in by_v.values())
    assert by_v["Customer#001"] != {"Customer#001"}
    # salt changes the mapping
    out2 = df.select(pseudonymize(F.col("v"), salt="other").alias("p")).collect()
    assert out2[0].p != out[0].p


def test_pseudonymize_reference_compat_vectors(spark):
    """reference_compat=True must reproduce the reference's output
    shape exactly (utils.py:580-627: blake2b digest_size=24 ->
    uppercase base32, '=' stripped, truncated to max(16, len)).
    Vectors below were derived by evaluating that recipe on paper —
    blake2b("<value>s3cret", 24) -> b32 -> slice — NOT by importing
    the reference."""
    import pandas as pd
    import pyspark.sql.functions as F

    from data_validator_spark.functions.scalars import pseudonymize

    expected = {
        # short inputs GROW to 16 chars
        "user123": "SCUNX7GY6HDNC3SK",
        "x": "GLVZW42BV4CJ5TXG",
        "": "5OS5UB5SRVBZIKCW",
        # longer than the 39-char digest encoding -> capped at 39
        "a-very-long-identifier-string-0123456789":
            "43ZXA5NGRPPVV2FVMUYK644CBYYAV5YC47AICRY",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"v": list(expected) + [None]})
    )
    out = {
        r.v: r.p
        for r in df.select(
            "v",
            pseudonymize(F.col("v"), salt="s3cret", reference_compat=True).alias("p"),
        ).collect()
    }
    for raw, want in expected.items():
        assert out[raw] == want, raw
    assert out[None] is None


def test_winnow_fingerprints(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.operators.text import winnow_fingerprints

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog and runs far away"),
        ("b", "the quick brown fox jumps over the lazy dog and walks far away"),
        ("c", "completely different text about spark execution engines at scale"),
        ("tiny", "two words"),
        ("empty", ""),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    fps = {
        r["id"]: set(r["fp"] or [])
        for r in df.select(
            "id", winnow_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    # near-dup docs share most fingerprints; unrelated share none
    assert len(fps["a"] & fps["b"]) >= len(fps["a"]) - 1
    assert not (fps["a"] & fps["c"])
    assert fps["tiny"] == set() and fps["empty"] == set()
    # short-but-real doc still gets at least one fingerprint
    one = spark.createDataFrame(
        [("s", "alpha beta gamma delta")], "id string, text string"
    ).select(winnow_fingerprints(F.col("text")).alias("fp")).collect()[0]
    assert len(one["fp"]) >= 1


def test_winnow_guarantee_on_shared_run(spark):
    # any shared run of >= n + window - 1 = 6 words must share >= 1 fp
    from pyspark.sql import functions as F

    from data_validator_spark.operators.text import winnow_fingerprints

    shared = "one two three four five six"
    rows = [("x", f"prefix words {shared}"), ("y", f"{shared} suffix tail here")]
    df = spark.createDataFrame(rows, "id string, text string")
    fps = {
        r["id"]: set(r["fp"])
        for r in df.select("id", winnow_fingerprints(F.col("text")).alias("fp")).collect()
    }
    assert fps["x"] & fps["y"]


def test_mojibake_detection(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.operators.text import mojibake_count, mojibake_flag

    rows = [
        ("clean", "a perfectly normal sentence with no damage at all"),
        ("smart", "donâ€™t stop â€” keep going"),
        ("accent", "the cafÃ© serves crÃ¨me brÃ»lÃ©e"),
        ("repl", "broken � bytes"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: (r["n"], r["flag"])
        for r in df.select(
            "id",
            mojibake_count(F.col("text")).alias("n"),
            mojibake_flag(F.col("text")).alias("flag"),
        ).collect()
    }
    assert got["clean"] == (0, None)
    assert got["smart"][0] == 2 and "text_mojibake(" in got["smart"][1]
    assert got["accent"][0] == 4 and got["accent"][1] is not None
    assert got["repl"][0] == 1
    assert got["empty"] == (0, None)


def test_repetition_features_planted_shapes(spark):
    from data_validator_spark.operators.text import (
        repetition_features,
        repetition_flag,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo\ncharlie delta\nalpha bravo\nalpha bravo"),
            (2, "unique one\nunique two\nunique three"),
            (3, "spam spam spam spam spam spam spam spam"),
            (4, ""),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in repetition_features(docs).collect()}
    # doc 1: 4 lines, 2 distinct -> dup_line_frac = 0.5; the three
    # 'alpha bravo' lines hold 33 of 46 chars
    assert got[1].rep_n_lines == 4
    assert got[1].rep_dup_line_frac == 0.5
    assert got[1].rep_dup_line_char_frac == round(33 / 46, 6)
    assert got[2].rep_dup_line_frac == 0.0
    assert got[2].rep_dup_line_char_frac == 0.0
    # doc 3: 'spam spam' 2-gram occurs 7x, len 9, norm_len 39
    assert got[3].rep_top2gram_char_frac == round(7 * 9 / 39, 6)
    # doc 2: top 2-gram occurs once -> NO repetition -> 0
    assert got[2].rep_top2gram_char_frac == 0.0
    # empty text: single empty line, no grams -> all zeros, no crash
    assert got[4].rep_top2gram_char_frac == 0.0
    flags = {r.doc_id: r.rep_flagged for r in repetition_flag(docs).collect()}
    assert flags[1] and flags[3] and not flags[2]
