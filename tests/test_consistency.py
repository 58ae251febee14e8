import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators.consistency import (
    fd_profile,
    fd_violations,
    reconcile,
)


def test_fd_violations_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", "x"), ("a", "x"),            # holds
            ("b", "x"), ("b", "y"), ("b", "z"),  # 3 variants
            ("c", None), ("c", "q"),            # NULL dependent ignored -> holds
            (None, "x"),                        # NULL determinant excluded
        ],
        "k string, v string",
    )
    got = {r["k"]: r for r in fd_violations(df, ["k"], "v").collect()}
    assert set(got) == {"a", "b", "c"}
    assert (got["a"]["n_variants"], got["a"]["fd_holds"]) == (1, True)
    assert (got["b"]["n_rows"], got["b"]["n_variants"], got["b"]["fd_holds"]) == (3, 3, False)
    assert (got["c"]["n_rows"], got["c"]["n_variants"], got["c"]["fd_holds"]) == (2, 1, True)


def test_fd_violations_examples_sorted_capped(spark):
    df = spark.createDataFrame(
        [("b", "z"), ("b", "x"), ("b", "y"), ("b", "w")], "k string, v string"
    )
    row = fd_violations(df, ["k"], "v", max_examples=2).collect()[0]
    assert row["examples"] == ["w", "x"]


def test_fd_profile(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("b", "y")], "k string, v string"
    )
    out = {r["fd_name"]: r for r in fd_profile({"t.k->v": (df, ["k"], "v")}).collect()}
    r = out["t.k->v"]
    assert (r["n_keys"], r["n_violating_keys"], r["max_variants"]) == (2, 1, 2)
    assert r["violation_rate"] == 0.5


def test_reconcile_statuses(spark):
    left = spark.createDataFrame(
        [("p1", 10, 100.0), ("p2", 5, 50.0), ("p3", 1, 9.0)],
        "k string, n long, s double",
    )
    right = spark.createDataFrame(
        [("p1", 10, 100.0), ("p2", 7, 50.0), ("p4", 2, 2.0)],
        "k string, n long, s double",
    )
    rows = reconcile(left, right, ["k"], ["n", "s"]).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    assert [r["status"] for r in by_key["p1"]] == ["match"]
    assert by_key["p1"][0]["measure"] is None
    mism = by_key["p2"]
    assert [r["status"] for r in mism] == ["mismatch"]  # only n fails
    assert mism[0]["measure"] == "n"
    assert (mism[0]["left_value"], mism[0]["right_value"], mism[0]["abs_diff"]) == (5.0, 7.0, 2.0)
    assert [r["status"] for r in by_key["p3"]] == ["missing_right"]
    assert [r["status"] for r in by_key["p4"]] == ["missing_left"]


def test_reconcile_tolerance(spark):
    left = spark.createDataFrame([("p1", 100.0)], "k string, s double")
    right = spark.createDataFrame([("p1", 100.5)], "k string, s double")
    assert reconcile(left, right, ["k"], ["s"], abs_tol=1.0).collect()[0]["status"] == "match"
    assert reconcile(left, right, ["k"], ["s"], rel_tol=0.01).collect()[0]["status"] == "match"
    assert reconcile(left, right, ["k"], ["s"]).collect()[0]["status"] == "mismatch"


def test_reconcile_null_measure_both_sides_matches(spark):
    left = spark.createDataFrame([("p1", None)], "k string, s double")
    right = spark.createDataFrame([("p1", None)], "k string, s double")
    assert reconcile(left, right, ["k"], ["s"]).collect()[0]["status"] == "match"


def test_fd_shuffle_plan_bounded(spark):
    # exact count_distinct alongside count plans the canonical
    # two-phase distinct aggregation: Exchange on (k, v) for the
    # distinct rewrite, then Exchange on (k) for the final — exactly
    # 2 shuffles, never more, and both carry only (k, v) pairs.
    df = spark.createDataFrame([("a", "x")], "k string, v string")
    out = fd_violations(df, ["k"], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n = sum(1 for l in plan.splitlines() if "Exchange hashpartitioning" in l)
    assert n <= 2, plan


def test_table_diff_statuses(spark):
    from data_validator_spark.operators.consistency import table_diff

    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    cur = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.5), (3, "c", None), (5, "e", 5.0)],
        "k int, s string, v double",
    )
    got = {r["k"]: r for r in table_diff(base, cur, ["k"]).collect()}
    assert got[1]["status"] == "unchanged" and got[1]["changed_cols"] is None
    assert got[2]["status"] == "changed" and got[2]["changed_cols"] == "s,v"
    assert got[3]["status"] == "unchanged"  # NULL == NULL is not a change
    assert got[4]["status"] == "removed"
    assert got[5]["status"] == "added"


def test_table_diff_null_to_value_is_change(spark):
    from data_validator_spark.operators.consistency import table_diff

    base = spark.createDataFrame([(1, None)], "k int, v double")
    cur = spark.createDataFrame([(1, 2.0)], "k int, v double")
    row = table_diff(base, cur, ["k"]).collect()[0]
    assert row["status"] == "changed" and row["changed_cols"] == "v"


def test_join_audit(spark):
    from data_validator_spark.operators.consistency import join_audit

    fact = spark.createDataFrame([(1,), (1,), (2,), (3,), (None,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,), (2,)], "pk int")
    r = join_audit(fact, dim, "fk", "pk").collect()[0]
    assert (r["n_fact"], r["n_fact_null_fk"]) == (5, 1)
    assert (r["n_dim"], r["n_dim_dup_keys"], r["max_fanout"]) == (3, 1, 2)
    assert r["n_orphan_fact"] == 1
    assert r["coverage_rate"] == 0.75
    assert r["est_join_rows"] == 4  # 2*1 (key 1) + 1*2 (key 2)


def test_join_audit_empty_dim(spark):
    from data_validator_spark.operators.consistency import join_audit

    fact = spark.createDataFrame([(1,)], "fk int")
    dim = spark.createDataFrame([], "pk int")
    r = join_audit(fact, dim, "fk", "pk").collect()[0]
    assert (r["n_dim"], r["n_orphan_fact"], r["est_join_rows"]) == (0, 1, 0)
    assert r["coverage_rate"] == 0.0


def test_freshness_audit(spark):
    from data_validator_spark.operators.consistency import freshness_audit

    df = spark.createDataFrame(
        [
            ("live", "2024-03-10 12:00:00"),
            ("live", "2024-03-09 12:00:00"),
            ("stale", "2024-03-01 12:00:00"),
        ],
        "feed string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["feed"]: r for r in freshness_audit(df, "feed", "ts").collect()}
    assert got["live"]["lag_hours"] == 0.0 and not got["live"]["stale"]
    assert got["stale"]["lag_hours"] == 216.0 and got["stale"]["stale"]


def test_freshness_audit_all_null_ts_group_emits_row(spark):
    """A feed that never stamped a single arrival must stay visible
    (n_rows=0, null lag/stale), not silently vanish from the audit."""
    import datetime as dt

    from data_validator_spark.operators.consistency import freshness_audit

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("live", t0), ("live", t0 + dt.timedelta(hours=2)),
        ("dead", None), ("dead", None),
    ]
    df = spark.createDataFrame(rows, "feed string, ts timestamp")
    got = {r["feed"]: r for r in freshness_audit(df, "feed", "ts").collect()}
    assert set(got) == {"live", "dead"}
    d = got["dead"]
    assert (d["n_rows"], d["last_ts"], d["lag_hours"], d["stale"]) == (0, None, None, None)
    assert got["live"]["n_rows"] == 2 and got["live"]["lag_hours"] == 0.0
