"""Winner-selection + first-wins dedup truth tables (the reference's
dedup scenarios, VALIDATION_RULES.md:376-397 / firestore_services.py:293-357)."""

import datetime as dt

from pyspark.sql import functions as F

from data_validator_spark.operators.dedup import first_wins, flag_duplicates, winner_selection

TS = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "clip_id string, transcript string, updated_at timestamp, is_complete boolean"
    )
    return winner_selection(
        df, ["clip_id"], suffixed_col="clip_id",
    ).orderBy("updated_at").collect()


def test_singleton_is_winner(spark):
    out = _run(spark, [("a", "t", TS(0), False)])
    assert out[0].is_winner and out[0].dedup_msg is None and out[0].clip_id == "a"


def test_one_completed_wins(spark):
    out = _run(
        spark,
        [("a", "t1", TS(0), False), ("a", "t2", TS(1), True), ("a", "t3", TS(2), False)],
    )
    by_t = {r.transcript: r for r in out}
    assert by_t["t2"].is_winner and by_t["t2"].dedup_msg is None
    assert by_t["t2"].clip_id == "a"
    assert not by_t["t1"].is_winner and by_t["t1"].dedup_msg == "Duplicate"
    # losers suffixed oldest-first: t1 (older) -> :dup1, t3 -> :dup2
    assert by_t["t1"].clip_id == "a:dup1"
    assert by_t["t3"].clip_id == "a:dup2"


def test_multiple_completed_no_winner(spark):
    out = _run(
        spark,
        [("a", "t1", TS(0), True), ("a", "t2", TS(1), True), ("a", "t3", TS(2), False)],
    )
    assert all(not r.is_winner for r in out)
    assert all(r.dedup_msg == "multiple_completed_transcripts" for r in out)
    # EVERY row suffixed, oldest first (firestore_services.py:329-335)
    assert [r.clip_id for r in out] == ["a:dup1", "a:dup2", "a:dup3"]


def test_zero_completed_latest_wins(spark):
    out = _run(
        spark,
        [("a", "t1", TS(0), False), ("a", "t2", TS(5), False), ("a", "t3", TS(3), False)],
    )
    by_t = {r.transcript: r for r in out}
    assert by_t["t2"].is_winner and by_t["t2"].clip_id == "a"
    assert by_t["t1"].dedup_msg == "Duplicate" and by_t["t1"].clip_id == "a:dup1"
    assert by_t["t3"].dedup_msg == "Duplicate" and by_t["t3"].clip_id == "a:dup2"


def test_first_wins_deterministic(spark):
    df = spark.createDataFrame(
        [("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 9, "z")],
        "k string, seq long, v string",
    )
    kept = {r.k: r.v for r in first_wins(df, ["k"], "seq").collect()}
    assert kept == {"k1": "a", "k2": "z"}


def test_flag_duplicates_label(spark, clips, golden):
    flagged = flag_duplicates(clips.select("clip_id", "ingest_seq"), ["clip_id"], "ingest_seq")
    n_flagged = flagged.filter(F.col("_dup_label").isNotNull()).count()
    n_expected = golden.filter("inj_dup").count()
    assert n_flagged == n_expected
    sample = flagged.filter(F.col("_dup_label").isNotNull()).first()
    assert sample._dup_label == f"duplicate_clip_id({sample.clip_id})"


def test_dedup_pipeline_end_to_end(spark):
    """exact dups + near dups + a transitive chain through mixed tiers
    resolve to one keeper per true component; singletons keep
    themselves."""
    from data_validator_spark.operators.text_dedup import dedup_pipeline

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base.replace("lazy", "sleepy")      # near-dup of base
    near2 = near.replace("quick", "rapid")     # near-dup of near (2-hop)
    rows = [
        (1, base),
        (2, base),        # exact dup of 1
        (3, near),        # near-dup of 1
        (4, near2),       # near-dup of 3 (chain: 1-3-4)
        (5, "completely unrelated words about spark dataframes and shuffles"),
        (6, None),        # dropped (null text)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = dedup_pipeline(df, "doc_id", "text", n=3, threshold=0.5)
    keep = {r.id: (r.component, r.is_keeper) for r in res.keepers.collect()}
    assert keep[1] == (1, True)
    assert keep[2] == (1, False)   # exact tier
    assert keep[3] == (1, False)   # near-dup tier
    assert keep[4] == (1, False)   # transitive through 3
    assert keep[5] == (5, True)    # singleton
    assert 6 not in keep
    assert {r.dup_id for r in res.exact_pairs.collect()} == {2}
    v = {(r.id_a, r.id_b) for r in res.verified_pairs.collect()}
    assert (1, 3) in v and (3, 4) in v
    res.unpersist()


def test_winnow_candidates(spark):
    from data_validator_spark.operators.text_dedup import winnow_candidates

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away tonight"),
        (2, "the quick brown fox jumps over the lazy dog and walks far away tonight"),
        (3, "completely different text about spark engines running at warehouse scale"),
        (4, "another unrelated document discussing audio codecs and bitstreams here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_candidates(df, min_shared=1).collect()
    assert len(got) == 1
    assert (got[0]["id_a"], got[0]["id_b"]) == (1, 2)
    assert got[0]["n_shared"] >= 2


def test_winnow_candidates_hot_fingerprint_cap(spark):
    # a fingerprint shared by every doc (boilerplate) is dropped by
    # max_doc_freq before the join, so no all-pairs blow-up
    from data_validator_spark.operators.text_dedup import winnow_candidates

    boiler = "standard legal disclaimer text appended to every document"
    rows = [(i, f"unique content {i} alpha beta gamma {boiler}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = winnow_candidates(df, min_shared=1, max_doc_freq=5).collect()
    uncapped = winnow_candidates(df, min_shared=1, max_doc_freq=100).collect()
    assert len(uncapped) == 45  # all pairs via the boilerplate run
    # the universally-selected boilerplate fingerprints are dropped;
    # only grams selected in <= 5 docs survive, collapsing the
    # all-pairs fan-out to the handful of genuinely co-selected docs
    assert len(capped) < len(uncapped) / 4
