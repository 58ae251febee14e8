"""As-of join semantics + plan shape (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from data_validator_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),  # after r2 -> matches r2
            (2, "k1", _ts("2024-01-01 08:00:00")),  # exact tie with r1
            (3, "k1", _ts("2024-01-01 07:00:00")),  # before all rights
            (4, "k2", _ts("2024-01-01 12:00:00")),  # k2's only right is later
            (5, "k3", _ts("2024-01-01 12:00:00")),  # key with no rights at all
        ],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 08:00:00"), 100),  # r1
            ("k1", _ts("2024-01-01 09:00:00"), 200),  # r2
            ("k2", _ts("2024-01-01 13:00:00"), 300),  # after k2's left
        ],
        "k string, rts timestamp, rv int",
    )
    return left, right


def test_asof_backward_with_ties_and_unmatched(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rv"]
    )
    got = {r["lid"]: (r["rv"], r["asof_lag_us"]) for r in out.collect()}
    assert got[1] == (200, 3600 * 1_000_000)  # latest preceding, not first
    assert got[2] == (100, 0)  # at-or-before includes the exact tie
    assert got[3] == (None, None)  # nothing preceding
    assert got[4] == (None, None)  # right exists but only later
    assert got[5] == (None, None)  # key absent from right
    assert out.count() == left.count()  # LEFT semantics: no row lost


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _mk(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        right_cols=["rv"],
        tolerance=F.lit(30 * 60 * 1_000_000),  # 30 minutes
    )
    got = {r["lid"]: r["rv"] for r in out.collect()}
    # lid 1's match is 1h stale -> nulled, row kept
    assert got[1] is None and got[2] == 100
    assert out.count() == left.count()


def test_asof_single_exchange(spark):
    """The whole as-of is ONE hash shuffle on the key (plus the
    terminal collect): no join explosion, no extra repartition."""
    left, right = _mk(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rv"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_hash_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )
    assert n_hash_exchanges == 1, plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan, plan
