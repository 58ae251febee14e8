from pyspark.sql import functions as F

from data_validator_spark.operators.suggest import suggest_constraints
from data_validator_spark.rules import apply_rules
from data_validator_spark.rules.derive import rules_from_suggestions


def test_profile_then_enforce_roundtrip(spark):
    clean = spark.createDataFrame(
        [(i, f"n{i:03d}", "RED" if i % 2 else "BLUE", float(10 + i)) for i in range(50)],
        "id int, name string, color string, bal double",
    )
    sugg = suggest_constraints(clean)
    rules, checks = rules_from_suggestions(sugg)
    names = {r.name for r in rules}
    assert {"id_missing", "name_missing", "color_missing", "bal_missing"} <= names
    assert {"bal_under_min", "bal_over_max", "color_invalid"} <= names
    assert {c["column"] for c in checks if c["check"] == "unique"} >= {"id", "name"}

    dirty = spark.createDataFrame(
        [
            (1, "n001", "RED", 20.0),      # clean
            (2, None, "GREEN", 9.0),       # null name, bad color, under min
            (3, "n003", "BLUE", 1000.0),   # over max
        ],
        "id int, name string, color string, bal double",
    )
    v = apply_rules(dirty, rules, "t")
    msgs = {r["id"]: r["validation_msg_t"] for r in v.collect()}
    assert msgs[1] == ""
    assert "name_missing" in msgs[2]
    assert "color_invalid(GREEN)" in msgs[2]
    assert "bal_under_min(9.0)" in msgs[2]
    assert "bal_over_max(1000.0)" in msgs[3]


def test_non_negative_emitted_only_without_range(spark):
    rows = [
        ("x", "non_negative", None, None, None),
        ("y", "range", 1.0, 5.0, None),
        ("y", "non_negative", None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "column_name string, constraint string, lo double, hi double, allowed string"
    )
    rules, _ = rules_from_suggestions(df)
    names = [r.name for r in rules]
    assert "x_under_min" in names and "x_over_max" in names
    assert names.count("y_under_min") == 1  # from range, not doubled


def test_is_in_values_with_commas_roundtrip(spark):
    """The allowed set rides as a JSON array string: a value containing
    a comma must survive the suggest -> derive roundtrip intact (a
    comma-split would shred it into fragments rejecting valid rows)."""
    clean = spark.createDataFrame(
        [("Doe, Jane",), ("Roe, Richard",)] * 5, "who string"
    )
    sugg = suggest_constraints(clean)
    rules, _ = rules_from_suggestions(sugg)
    v = apply_rules(clean, rules, "t")
    assert all(r["validation_msg_t"] == "" for r in v.collect())
    bad = spark.createDataFrame([("Doe",)], "who string")
    vb = apply_rules(bad, rules, "t").collect()[0]
    assert "who_invalid" in vb["validation_msg_t"]
