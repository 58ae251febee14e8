"""Round-2 scale/contract behaviors: salted self-join skew bounds,
multi-band ANN recall, dependent-stratum sampling, and the invalid
side-channel contract for null payloads overlapping other hard rules."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators import sampling, similarity, text_dedup
from data_validator_spark.operators.skew import salted_self_join


@pytest.fixture(scope="module")
def hot_bucket_df(spark):
    # Zipf-ish: one bucket holds 900 of 1000 rows (the hot near-dup
    # cluster case), the rest spread across 10 buckets
    rows = [(i, 0 if i < 900 else 1 + i % 10) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, bucket int").withColumn(
        "band", F.lit(0)
    )


def test_salted_self_join_same_pairs_as_unsalted(spark, hot_bucket_df):
    salted = (
        salted_self_join(hot_bucket_df, "id", ["band", "bucket"], cap=100)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    plain = (
        salted_self_join(hot_bucket_df, "id", ["band", "bucket"], cap=10**9)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # 900-choose-2 + 10 cold buckets of 10 -> 450 pairs each
    assert plain.count() == 900 * 899 // 2 + 10 * (10 * 9 // 2)


def test_salted_self_join_bounds_per_key_cardinality(spark, hot_bucket_df):
    # reproduce the operator's internal chunking and assert no join-key
    # group exceeds cap rows per side once chunks are assigned
    cap = 100
    sizes = hot_bucket_df.groupBy("band", "bucket").count()
    hot = sizes.filter(F.col("count") > cap).withColumn(
        "k", F.ceil(F.col("count") / cap).cast("int")
    )
    bd = (
        hot_bucket_df.join(hot.select("band", "bucket", "k"), ["band", "bucket"], "left")
        .withColumn("k", F.coalesce("k", F.lit(1)))
        .withColumn("chunk", F.pmod(F.xxhash64("id"), F.col("k")))
    )
    per_key = bd.groupBy("band", "bucket", "chunk").count()
    max_side = per_key.agg(F.max("count")).collect()[0][0]
    # hash-balanced chunks: allow modest imbalance over the ideal cap
    assert max_side <= 1.5 * cap


def test_minhash_est_jaccard_matches_direct_signature_compare(spark):
    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4, "totally different content with other words entirely here now"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    cand = text_dedup.minhash_lsh_candidates(
        df, "doc_id", "text", n_hashes=32, bands=8
    )
    rows = {(r.id_a, r.id_b): r.est_jaccard for r in cand.collect()}
    assert rows[(1, 3)] == 1.0  # identical docs -> identical signatures
    assert (1, 2) in rows and rows[(1, 2)] > 0.5
    assert (1, 4) not in rows


def test_lsh_topk_finds_planted_twins(spark):
    import math

    rows = [
        (i, [math.sin(0.3 * i + 0.7 * j) for j in range(16)]) for i in range(200)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    twins = corpus.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * (1 + F.lit(0.05) * x)).alias(
            "embedding"
        ),
    )
    out = similarity.lsh_topk(
        corpus, twins, dim=16, k=1, n_planes=8, n_bands=8
    ).collect()
    found = {r.query_id: r.neighbor_id for r in out}
    # every twin's true nearest neighbor (its original) is recovered
    assert found == {1000 + i: i for i in range(10)}


def test_lsh_topk_recall_reported_on_weak_neighbors(spark):
    """Recall on *weakly similar* neighbors (random-ish vectors, cos ~
    0.3-0.7) — documents the measured recall so config changes that
    degrade it fail loudly. Multi-band probing is what lifts this
    above the single-band ~0.2."""
    import math

    rows = [
        (i, [math.sin(0.3 * i + 0.7 * j) for j in range(16)]) for i in range(200)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = corpus.filter(F.col("vec_id") < 10)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(corpus, q, k=3).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(
            corpus, q, dim=16, k=3, n_planes=6, n_bands=8
        ).collect()
    }
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.5, f"multi-band recall regressed: {recall}"


def test_embedding_near_dups_finds_planted_twins(spark):
    import math

    rows = [
        (i, [math.sin(0.3 * i + 0.7 * j) for j in range(16)]) for i in range(200)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    twins = base.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * (1 + F.lit(0.05) * x)).alias(
            "embedding"
        ),
    )
    aug = base.unionByName(twins)
    pairs = similarity.embedding_near_dups(
        aug, dim=16, threshold=0.99, n_planes=10, n_bands=6
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got >= {(i, 1000 + i) for i in range(20)}


def test_dependent_quota_sample_restricts_parents_to_picked(spark):
    kids_rows = [(i, i % 40, "s" + str(i % 2)) for i in range(200)]
    children = spark.createDataFrame(kids_rows, "kid long, parent long, stratum string")
    parents = spark.createDataFrame(
        [(p, "p" + str(p % 3)) for p in range(40)], "parent long, pstratum string"
    )
    kids, pars = sampling.dependent_quota_sample(
        children,
        parents,
        child_strata_col="stratum",
        child_quotas={"s0": 10, "s1": 10},
        child_key_cols=["kid"],
        link_col="parent",
        parent_key_col="parent",
        parent_strata_col="pstratum",
        parent_quotas={"p0": 5, "p1": 5, "p2": 5},
        parent_key_cols=["parent"],
    )
    picked_parents = {r.parent for r in kids.select("parent").distinct().collect()}
    sampled_parents = {r.parent for r in pars.collect()}
    # dependency: every sampled parent is a parent OF a picked child
    assert sampled_parents <= picked_parents
    # quotas respected per parent stratum (capped by eligibility)
    per = {r.pstratum: r.n for r in pars.groupBy("pstratum").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 5 for n in per.values())
    # determinism
    kids2, pars2 = sampling.dependent_quota_sample(
        children, parents, "stratum", {"s0": 10, "s1": 10}, ["kid"],
        "parent", "parent", "pstratum", {"p0": 5, "p1": 5, "p2": 5}, ["parent"],
    )
    assert sorted(r.parent for r in pars2.collect()) == sorted(sampled_parents)


def test_dependent_quota_underfull_stratum_yields_what_it_has(spark):
    children = spark.createDataFrame(
        [(1, 7, "s0"), (2, 7, "s0")], "kid long, parent long, stratum string"
    )
    parents = spark.createDataFrame(
        [(7, "p0"), (8, "p0"), (9, "p1")], "parent long, pstratum string"
    )
    kids, pars = sampling.dependent_quota_sample(
        children, parents, "stratum", {"s0": 10}, ["kid"],
        "parent", "parent", "pstratum", {"p0": 5, "p1": 5}, ["parent"],
    )
    assert kids.count() == 2  # under-full child stratum: no refill
    rows = pars.collect()
    # only parent 7 is eligible (8 has no picked child, 9's stratum empty)
    assert [r.parent for r in rows] == [7]


def test_null_payload_plus_other_hard_rule_emits_both_violations(spark):
    """ADVICE round-1 (medium): a row failing a non-bytes hard rule AND
    carrying a null payload must emit bytes_missing too, and the
    invalid side-channel must be IDENTICAL for check_audio True/False."""
    from data_validator_spark.plans import ValidationConfig, run_validation

    row = [
        ("c1", None, 16000, 3000, None, "t", dt.date(2026, 1, 1), 0),
        ("c2", None, 16000, 3000, "pcm16", "t", dt.date(2026, 1, 1), 1),
        ("c3", bytes(b"RIFFxxxx"), 16000, 3000, None, "t", dt.date(2026, 1, 1), 2),
    ]
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, ingest_date date, ingest_seq long"
    )
    clips = spark.createDataFrame(row, schema)
    with_audio = run_validation(clips, None, cfg=ValidationConfig(check_audio=True))
    without = run_validation(clips, None, cfg=ValidationConfig(check_audio=False))
    got_a = sorted(
        (r.ingest_seq, r.rule) for r in with_audio.invalid.collect()
    )
    got_b = sorted((r.ingest_seq, r.rule) for r in without.invalid.collect())
    assert got_a == got_b
    # c1: codec_missing AND bytes_missing; c2: bytes_missing only
    assert (0, "bytes_missing") in got_a and (0, "codec_missing") in got_a
    assert (1, "bytes_missing") in got_a


def test_connected_components_chain_and_cliques(spark):
    from data_validator_spark.operators.graph import connected_components, dedup_clusters

    edges = spark.createDataFrame(
        # a 5-node chain (needs multi-round propagation) + a disjoint triangle
        [(10, 20), (20, 30), (30, 40), (40, 50), (7, 8), (8, 9), (7, 9)],
        "id_a long, id_b long",
    )
    cc = {r.id: r.component for r in connected_components(edges).collect()}
    assert {cc[x] for x in (10, 20, 30, 40, 50)} == {10}
    assert {cc[x] for x in (7, 8, 9)} == {7}
    # dedup action: exactly one keeper per component, keeper == min id
    cl = dedup_clusters(edges).collect()
    keepers = {r.component for r in cl if r.is_keeper}
    assert keepers == {7, 10}
    assert sum(1 for r in cl if r.is_keeper) == 2
    # determinism
    cc2 = {r.id: r.component for r in connected_components(edges).collect()}
    assert cc2 == cc
    # the label-propagation path answers identically on shallow graphs
    cc3 = {
        r.id: r.component
        for r in connected_components(edges, algorithm="label").collect()
    }
    assert cc3 == cc


def test_connected_components_deep_chain_logarithmic(spark):
    """star contraction on a 2,000-node CHAIN (worst case for label
    propagation: diameter 1999) must converge in O(log n) rounds —
    max_iter = log2(n)+4 would raise ConvergenceError if rounds grew
    linearly, and label propagation at max_iter=25 must raise instead
    of silently returning split components (ADVICE r2, graph.py:57)."""
    import math

    import pytest

    from data_validator_spark.operators.graph import (
        ConvergenceError,
        connected_components,
    )

    n = 2000
    edges = spark.range(1, n).select(
        (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
    )
    budget = int(math.log2(n)) + 4  # 14 rounds for n=2000
    cc = connected_components(edges, max_iter=budget, algorithm="star")
    comps = cc.select("component").distinct().collect()
    assert [r.component for r in comps] == [0]
    assert cc.count() == n
    # label propagation needs ~n rounds here -> must raise, not lie
    with pytest.raises(ConvergenceError):
        connected_components(edges, max_iter=10, algorithm="label").collect()


def test_ivf_topk_finds_planted_twins_and_subsets_bruteforce(spark):
    import math

    rows = [
        (i, [math.sin(0.3 * i + 0.7 * j) for j in range(16)]) for i in range(300)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    twins = corpus.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * (1 + F.lit(0.05) * x)).alias(
            "embedding"
        ),
    )
    out = similarity.ivf_topk(
        corpus, twins, dim=16, k=1, n_cells=8, nprobe=3
    ).collect()
    found = {r.query_id: (r.neighbor_id, r.rank) for r in out}
    assert found == {1000 + i: (i, 1) for i in range(8)}
    # every IVF hit carries the exact cosine brute force would compute
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.brute_force_topk(corpus, twins, k=300).collect()
    }
    for r in out:
        assert bf[(r.query_id, r.neighbor_id)] == r.cos_sim


def test_ivfpq_matches_brute_force_on_twins(spark):
    """IVF-PQ (codes-only inverted lists + ADC shortlist + exact
    refine) returns the identical top-1 rows as exact brute force for
    near-duplicate queries."""
    import math

    corpus = spark.createDataFrame(
        [(i, [math.sin(0.3 * i + 0.7 * j) for j in range(16)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    pert = corpus.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * (1 + F.lit(0.05) * x)).alias(
            "embedding"
        ),
    )
    pq = (
        similarity.ivfpq_topk(
            corpus, pert, dim=16, k=1, n_cells=8, nprobe=3, n_sub=4, n_pq=16
        )
        .orderBy("query_id")
        .collect()
    )
    bf = (
        similarity.brute_force_topk(corpus, pert, k=1)
        .orderBy("query_id")
        .collect()
    )
    assert [tuple(r) for r in pq] == [tuple(r) for r in bf]


def test_embedding_audit(spark):
    from data_validator_spark.operators.similarity import embedding_audit

    rows = [
        ([0.6, 0.8],), ([3.0, 4.0],), (None,), ([1.0],),
        ([float("nan"), 1.0],), ([0.0, 0.0],),
    ]
    df = spark.createDataFrame(rows, "v array<float>")
    r = embedding_audit(df, "v", 2).collect()[0]
    assert (r["n_rows"], r["n_null"], r["n_wrong_dim"]) == (6, 1, 1)
    assert (r["n_nonfinite"], r["n_zero"], r["n_valid"]) == (1, 1, 2)
    assert (r["min_norm"], r["avg_norm"], r["max_norm"]) == (1.0, 3.0, 5.0)


def test_centroid_drift(spark):
    from data_validator_spark.operators.similarity import centroid_drift

    base = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", [1.0, 0.2]), ("b", [0.0, 1.0])],
        "g string, v array<float>",
    )
    cur = spark.createDataFrame(
        [("a", [1.0, 0.1]), ("b", [1.0, 0.0]), ("c", [0.5, 0.5])],
        "g string, v array<float>",
    )
    got = {r["g"]: r for r in centroid_drift(base, cur, "g", "v", 2).collect()}
    assert got["a"]["centroid_cos"] == 1.0 and got["a"]["norm_ratio"] == 1.0
    assert got["b"]["centroid_cos"] == 0.0  # rotated 90 degrees
    assert got["c"]["centroid_cos"] is None and got["c"]["n_base"] == 0
    # wrong-width vectors are excluded, not averaged in
    dirty = base.union(
        spark.createDataFrame([("a", [9.0])], "g string, v array<float>")
    )
    got2 = {r["g"]: r for r in centroid_drift(dirty, cur, "g", "v", 2).collect()}
    assert got2["a"]["n_base"] == 2


def test_skew_report(spark):
    from data_validator_spark.operators.skew import skew_report

    rows = [("hot",)] * 900 + [(f"k{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, "k", top_k=3).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["top_key"], r["max_cnt"]) == (1000, 101, "hot", 900)
    assert r["max_share"] == 0.9 and r["salt_recommended"]
    assert abs(r["imbalance"] - 90.9) < 0.01
    # uniform key -> no salt advisory
    uni = spark.createDataFrame([(f"k{i % 50}",) for i in range(1000)], "k string")
    r2 = skew_report(uni, "k").collect()[0]
    assert not r2["salt_recommended"] and r2["imbalance"] == 1.0
