"""Bucketized interval join (operators/intervals.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_validator_spark.operators.intervals import interval_join


def _fixtures(spark):
    points = spark.createDataFrame(
        [
            (1, 100),   # inside iv A [100, 200)
            (2, 199),   # inside A (end exclusive boundary below)
            (3, 200),   # NOT inside A (half-open end)
            (4, 1500),  # inside B [1000, 2000) — B spans many buckets
            (5, 50),    # before everything
            (6, 150),   # inside A too
        ],
        "pid int, ts long",
    )
    intervals = spark.createDataFrame(
        [("A", 100, 200), ("B", 1000, 2000), ("C", 140, 160)],
        "ivid string, s long, e long",
    )
    return points, intervals


def test_interval_join_containment_half_open(spark):
    points, intervals = _fixtures(spark)
    out = interval_join(points, intervals, "ts", "s", "e", bucket=64, how="inner")
    pairs = {(r["pid"], r["ivid"]) for r in out.collect()}
    assert pairs == {(1, "A"), (2, "A"), (4, "B"), (6, "A"), (6, "C")}


def test_interval_join_semi_anti_left(spark):
    points, intervals = _fixtures(spark)
    semi = interval_join(points, intervals, "ts", "s", "e", bucket=64, how="left_semi")
    assert {r["pid"] for r in semi.collect()} == {1, 2, 4, 6}
    assert semi.count() == 4  # pid 6 matches two intervals but appears once
    anti = interval_join(points, intervals, "ts", "s", "e", bucket=64, how="left_anti")
    assert {r["pid"] for r in anti.collect()} == {3, 5}
    left = interval_join(points, intervals, "ts", "s", "e", bucket=64, how="left")
    rows = left.collect()
    assert len(rows) == 7  # 5 matches + 2 unmatched null rows
    assert {r["pid"] for r in rows if r["ivid"] is None} == {3, 5}


def test_interval_join_is_hash_join_not_nested_loop(spark):
    """The whole point of bucketizing: the plan must be an equi hash
    join on the bucket, never BroadcastNestedLoopJoin/Cartesian."""
    points, intervals = _fixtures(spark)
    out = interval_join(points, intervals, "ts", "s", "e", bucket=64, how="inner")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_interval_join_extra_keys(spark):
    points = spark.createDataFrame(
        [(1, "dev1", 100), (2, "dev2", 100)], "pid int, k string, ts long"
    )
    intervals = spark.createDataFrame(
        [("dev1", 50, 150)], "k string, s long, e long"
    )
    out = interval_join(
        points, intervals, "ts", "s", "e", bucket=64, keys=["k"], how="left_semi"
    )
    assert {r["pid"] for r in out.collect()} == {1}


def test_interval_join_malformed_intervals_dropped_before_explode(spark):
    """end <= start can never match under the half-open predicate; an
    unfiltered sequence() would auto-descend (step -1) and explode a
    huge spurious bucket range for garbage rows like (start=10^9,
    end=0). Must return cleanly, and 'left' keeps unmatched points."""
    from data_validator_spark.operators.intervals import interval_join

    points = spark.createDataFrame([(5,), (15,)], "t long")
    ivs = spark.createDataFrame(
        [(0, 10, "ok"), (1_000_000_000, 0, "garbage"), (7, 7, "empty")],
        "s long, e long, tag string",
    )
    got = interval_join(points, ivs, "t", "s", "e", bucket=10).collect()
    assert [(r["t"], r["tag"]) for r in got] == [(5, "ok")]
    left = interval_join(points, ivs, "t", "s", "e", bucket=10, how="left")
    rows = {(r["t"], r["tag"]) for r in left.collect()}
    assert rows == {(5, "ok"), (15, None)}
