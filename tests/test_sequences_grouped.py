"""Straight-lining window rule + grouped aggregate rules."""

import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators.grouped import (
    _binom_cdf_scalar,
    below_chance_flags,
    count_threshold_flags,
)
from data_validator_spark.operators.sequences import straightlining_flags


def test_straightlining_detects_run(spark):
    rows = []
    # run A: 12 consecutive identical locations -> flagged
    rows += [("A", i, "left") for i in range(12)]
    # run B: alternating -> max run 1
    rows += [("B", i, "left" if i % 2 else "right") for i in range(20)]
    # run C: 9 consecutive -> below threshold
    rows += [("C", i, "left") for i in range(9)] + [("C", 9, "right")]
    # run D: nulls/empties excluded from sequence (core_models.py:393-397)
    rows += [("D", i, "left") for i in range(5)] + [("D", 5, None), ("D", 6, "")] + [
        ("D", i, "left") for i in range(7, 12)
    ]
    df = spark.createDataFrame(rows, "run_id string, trial_index int, loc string")
    out = {r.run_id: r for r in straightlining_flags(df, "run_id", "trial_index", "loc").collect()}
    assert out["A"].straightlining and out["A"].straightlining_msg == "straightlining_10"
    assert not out["B"].straightlining
    assert not out["C"].straightlining
    # D: null/empty rows removed -> the two 5-runs become one 10-run?
    # No: exclusion removes rows, making positions 4 and 7 adjacent —
    # the reference behaves the same way (excluded trials don't break
    # runs), so D IS flagged with a 10-run.
    assert out["D"].straightlining


def test_count_threshold(spark):
    df = spark.createDataFrame(
        [("r1", i) for i in range(12)] + [("r2", i) for i in range(4)],
        "run_id string, i int",
    )
    out = {r.run_id: r for r in count_threshold_flags(df, "run_id", min_count=10).collect()}
    assert out["r1"].flag_msg is None and out["r1"].n == 12
    assert out["r2"].flag_msg == "less_than_10_test_trials" and out["r2"].n == 4


def test_binom_cdf_exact_values():
    # scipy.stats.binomtest(2, 10, 0.25, alternative='less').pvalue
    assert _binom_cdf_scalar(2, 10, 0.25) == pytest.approx(0.5255928039550781, rel=1e-9)
    assert _binom_cdf_scalar(0, 8, 0.25) == pytest.approx(0.75**8, rel=1e-9)
    assert _binom_cdf_scalar(10, 10, 0.25) == pytest.approx(1.0, abs=1e-12)
    assert _binom_cdf_scalar(-1, 10, 0.25) == 0.0


def test_below_chance_flags(spark):
    rows = [("good", True)] * 9 + [("good", False)] * 3
    rows += [("bad", False)] * 14  # CDF(0;14,.25)=.75^14~.018 < .05
    rows += [("tiny", False)] * 5  # n < 8 -> no test
    df = spark.createDataFrame(rows, "run_id string, correct boolean")
    out = {r.run_id: r for r in below_chance_flags(df, "run_id").collect()}
    assert out["tiny"].bc_p is None and out["tiny"].bc_p_below is None
    assert out["bad"].bc_p_below is True  # 1/12 correct at chance .25
    assert out["good"].bc_p_below is False  # 9/12 correct
    assert out["good"].bc_p == pytest.approx(0.9998934, rel=1e-3)


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    from data_validator_spark.operators.sequences import sessionize, session_stats

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [
            ("u1", 1, at(0)),
            ("u1", 2, at(5)),    # 5 min gap -> same session
            ("u1", 3, at(20)),   # 15 min gap -> new session
            ("u1", 4, at(21)),
            ("u2", 5, at(0)),    # other key: own numbering
        ],
        "k string, eid int, ts timestamp",
    )
    gap = 10 * 60 * 1_000_000
    s = sessionize(df, "k", "ts", gap_us=gap, tiebreak_col="eid")
    got = {r["eid"]: r["session_seq"] for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}

    stats_rows = {
        (r["k"], r["session_seq"]): (r["n_events"], r["span_us"])
        for r in session_stats(df, "k", "ts", gap_us=gap, tiebreak_col="eid").collect()
    }
    assert stats_rows[("u1", 1)] == (2, 5 * 60 * 1_000_000)
    assert stats_rows[("u1", 2)] == (2, 1 * 60 * 1_000_000)
    assert stats_rows[("u2", 1)] == (1, 0)


def test_session_stats_single_exchange(spark):
    """sessionize's two windows and the stats groupBy all share the
    key partitioning -> exactly one hash Exchange in the plan."""
    import datetime as dt

    from data_validator_spark.operators.sequences import session_stats

    df = spark.createDataFrame(
        [("u1", 1, dt.datetime(2024, 1, 1, 8, 0, 0))],
        "k string, eid int, ts timestamp",
    )
    out = session_stats(df, "k", "ts", gap_us=1_000_000, tiebreak_col="eid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n = sum(1 for l in plan.splitlines() if "Exchange hashpartitioning" in l)
    assert n == 1, plan


def test_order_violations_semantics(spark):
    from data_validator_spark.operators.sequences import order_violations

    df = spark.createDataFrame(
        [
            ("a", 1, 10), ("a", 2, 20), ("a", 3, 15),  # one regression
            ("b", 1, 5), ("b", 2, 5),                   # ties: ok unless strict
            ("c", 1, 9), ("c", 2, None),                # null value excluded
        ],
        "k string, seq int, v int",
    )
    got = {
        r["k"]: (r["n_rows"], r["n_inversions"], r["monotonic"])
        for r in order_violations(df, "k", "seq", "v").collect()
    }
    assert got["a"] == (3, 1, False)
    assert got["b"] == (2, 0, True)
    assert got["c"] == (1, 0, True)
    strict = {
        r["k"]: r["n_inversions"]
        for r in order_violations(df, "k", "seq", "v", strict=True).collect()
    }
    assert strict["b"] == 1  # tie counts under strict


def test_gap_report_semantics(spark):
    from data_validator_spark.operators.sequences import gap_report

    df = spark.createDataFrame(
        [
            ("a", 1), ("a", 2), ("a", 3),   # complete
            ("b", 1), ("b", 3), ("b", 7),   # 2 gap runs, 4 missing
            ("c", 5), ("c", 5), ("c", 6),   # one dup
            ("d", None),                    # null seq excluded entirely
        ],
        "k string, s int",
    )
    got = {r["k"]: r for r in gap_report(df, "k", "s").collect()}
    assert set(got) == {"a", "b", "c"}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a["n_gaps"], a["n_missing"], a["n_dups"], a["complete"]) == (0, 0, 0, True)
    assert (b["n_gaps"], b["n_missing"], b["complete"]) == (2, 4, False)
    assert (b["min_seq"], b["max_seq"], b["n_distinct"]) == (1, 7, 3)
    assert (c["n_dups"], c["n_missing"], c["complete"]) == (1, 0, False)


def test_gap_report_single_exchange(spark):
    from data_validator_spark.operators.sequences import gap_report

    df = spark.createDataFrame([("a", 1)], "k string, s int")
    plan = gap_report(df, "k", "s")._jdf.queryExecution().executedPlan().toString()
    n = sum(1 for l in plan.splitlines() if "Exchange hashpartitioning" in l)
    assert n == 1, plan


def test_burst_report(spark):
    from data_validator_spark.operators.sequences import burst_report

    rows = [("u1", f"2024-01-01 00:00:{s:02d}") for s in [0, 1, 2, 3, 30]] + [
        ("u2", f"2024-01-01 00:{m:02d}:00") for m in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, ts string")
    got = {
        r["k"]: r
        for r in burst_report(df, "k", "ts", window_s=10.0, threshold=3).collect()
    }
    # u1: 4 events within 10s (0..3s) then a straggler -> max burst 4
    assert (got["u1"]["max_burst"], got["u1"]["bursty"]) == (4, True)
    assert got["u1"]["n_burst_rows"] == 1  # only the 4th event breaches
    # u2: one event per minute -> never more than 1 in any 10s window
    assert (got["u2"]["max_burst"], got["u2"]["bursty"]) == (1, False)
