"""Count-Min sketch invariants (operators/cms.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_validator_spark.operators.cms import cms_estimate, cms_sketch


def _keyed(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k string")


def test_cms_never_underestimates_under_forced_collisions(spark):
    # width 4 with 40 distinct keys guarantees heavy collisions: the
    # one-sided error property must survive them
    rows = [f"key{i}" for i in range(40) for _ in range(i % 5 + 1)]
    df = _keyed(spark, rows)
    sk = cms_sketch(df, "k", depth=3, width=4, seed=7)
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            spark, sk, [f"key{i}" for i in range(40)], depth=3, width=4, seed=7
        ).collect()
    }
    exact = {f"key{i}": i % 5 + 1 for i in range(40)}
    assert all(est[k] >= exact[k] for k in exact)
    # with width 4 some estimate MUST exceed its exact count
    assert any(est[k] > exact[k] for k in exact)


def test_cms_absent_key_and_n_recovery(spark):
    df = _keyed(spark, ["a"] * 5 + ["b"] * 3 + [None])
    depth = 4
    sk = cms_sketch(df, "k", depth=depth, width=64, seed=0).cache()
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            spark, sk, ["a", "b", "zzz"], depth=depth, width=64, seed=0
        ).collect()
    }
    assert est["a"] == 5 and est["b"] == 3
    assert est["zzz"] == 0  # absent key, no collision at width 64
    # every non-null item increments exactly `depth` cells
    n = sk.agg((F.sum("cnt") / depth).cast("long").alias("n")).collect()[0]["n"]
    assert n == 8  # null excluded


def test_cms_merge_is_additive(spark):
    """Sketching parts and summing cells == sketching the whole: the
    mergeability contract the map-side-partials design rests on."""
    part1 = _keyed(spark, ["x"] * 3 + ["y"])
    part2 = _keyed(spark, ["x"] * 2 + ["z"])
    whole = part1.unionAll(part2)
    kw = dict(depth=3, width=32, seed=1)
    merged = (
        cms_sketch(part1, "k", **kw)
        .unionAll(cms_sketch(part2, "k", **kw))
        .groupBy("idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_sketch(whole, "k", **kw)
    a = {(r["idx"], r["cnt"]) for r in merged.collect()}
    b = {(r["idx"], r["cnt"]) for r in direct.collect()}
    assert a == b
