from data_validator_spark.operators.schema_evolution import (
    schema_compat,
    schema_table,
)

_SCHEMA = "field string, dtype string, nullable boolean"


def test_schema_compat_classification(spark):
    base = spark.createDataFrame(
        [
            ("id", "int", False),
            ("score", "float", True),
            ("tag", "string", True),
            ("old", "string", True),
            ("strict", "string", True),
            ("loose", "string", False),
        ],
        _SCHEMA,
    )
    cur = spark.createDataFrame(
        [
            ("id", "bigint", False),        # widened -> compatible
            ("score", "string", True),      # changed -> breaking
            ("tag", "string", True),        # unchanged
            ("strict", "string", False),    # tightened -> breaking
            ("loose", "string", True),      # relaxed -> compatible
            ("new_opt", "double", True),    # added optional -> compatible
            ("new_req", "double", False),   # added required -> breaking
        ],
        _SCHEMA,
    )
    got = {r["field"]: (r["change"], r["verdict"]) for r in schema_compat(base, cur).collect()}
    assert got["id"] == ("type_widened", "compatible")
    assert got["score"] == ("type_changed", "breaking")
    assert got["tag"] == ("unchanged", "compatible")
    assert got["old"] == ("removed", "breaking")
    assert got["strict"] == ("nullability_tightened", "breaking")
    assert got["loose"] == ("nullability_relaxed", "compatible")
    assert got["new_opt"] == ("added", "compatible")
    assert got["new_req"] == ("added", "breaking")


def test_schema_table_roundtrip(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "a int, b string, c double")
    rows = {r["field"]: r["dtype"] for r in schema_table(df).collect()}
    assert rows == {"a": "int", "b": "string", "c": "double"}
    # identical schemas -> everything unchanged/compatible
    out = schema_compat(schema_table(df), schema_table(df)).collect()
    assert all(r["change"] == "unchanged" and r["verdict"] == "compatible" for r in out)
