import numpy as np

from data_validator_spark.operators.control import ewma_chart


def test_ewma_matches_recursive_and_flags_shift(spark):
    rng = np.random.RandomState(5)
    vals = list(rng.normal(100, 5, 30)) + list(rng.normal(130, 5, 10))
    df = spark.createDataFrame(
        [("s1", i, float(v)) for i, v in enumerate(vals)], "g string, t_in int, x double"
    )
    rows = ewma_chart(df, "g", "t_in", "x").orderBy("t_in").collect()
    a, ref = 0.2, []
    for i, v in enumerate(vals):
        ref.append(v if i == 0 else a * v + (1 - a) * ref[-1])
    assert max(abs(r["ewma"] - e) for r, e in zip(rows, ref)) < 1e-9
    flagged = {r["t"] for r in rows if r["out_of_control"]}
    assert flagged and min(flagged) > 30  # fires after the shift, not before
    assert all(not r["out_of_control"] for r in rows if r["t"] < 30)


def test_ewma_constant_series_never_flags(spark):
    df = spark.createDataFrame(
        [("c", i, 42.0) for i in range(20)], "g string, t_in int, x double"
    )
    rows = ewma_chart(df, "g", "t_in", "x").collect()
    assert all(not r["out_of_control"] for r in rows)
    assert all(abs(r["ewma"] - 42.0) < 1e-9 for r in rows)


def test_ewma_single_exchange(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "g string, t_in int, x double")
    plan = (
        ewma_chart(df, "g", "t_in", "x")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n = sum(1 for l in plan.splitlines() if "Exchange hashpartitioning" in l)
    assert n == 1, plan


def test_manifest_monitor_flags_quality_regression(spark):
    import datetime

    from data_validator_spark.operators.control import manifest_monitor

    rows = []
    for d in range(40):
        n = 1000
        soft = 20 + (d % 3)                 # stable ~2% soft rate
        if d == 35:
            soft = 300                      # regression day
        rows.append(
            (
                f"2024-02-{d+1:02d}" if d < 28 else f"2024-03-{d-27:02d}",
                "fp", "v1", "ok", n, soft, 5, 3,
                datetime.datetime(2024, 1, 1),
            )
        )
    m = spark.createDataFrame(
        rows,
        "partition_value string, fingerprint string, rule_version string, "
        "status string, n_rows long, n_soft_invalid long, n_hard_invalid long, "
        "n_warnings long, validated_at timestamp",
    )
    chart = manifest_monitor(m).collect()
    flagged = {
        (r["metric"], r["partition_value"]) for r in chart if r["out_of_control"]
    }
    assert any(m_ == "soft_invalid_rate" for m_, _ in flagged)
    # the regression partition itself is flagged on the soft series
    assert ("soft_invalid_rate", "2024-03-08") in flagged
    # hard/warning series stay in control
    assert not any(m_ == "hard_invalid_rate" for m_, _ in flagged)
