"""One-call table audit: the composed DQ report.

The UX tier over the analyzer suite (profile, entropy, Benford,
suggestion): one call, one long-format report DataFrame —
(section, column_name, metric, value_num, value_str) — the shape a
dashboard or a diff tool consumes directly. Public prior art:
Deequ's AnalysisRunner / ydata-profiling's report, re-expressed as
Spark aggregates.

Composition discipline: completeness/cardinality/range ride ONE
fused aggregate (suggest_constraints' scan); entropy adds its one
unpivot pass; Benford its one unpivot pass. Nothing here re-reads
the table per column, and the report itself is O(columns) rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPORT_SCHEMA = (
    "section string, column_name string, metric string, "
    "value_num double, value_str string"
)


def audit_report(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    benford_cols: list[str] | None = None,
) -> DataFrame:
    """-> (section, column_name, metric, value_num, value_str) rows:

      completeness  null_rate per column
      cardinality   n_distinct + distinct_ratio per column (exact)
      range         min / max per numeric column
      entropy       entropy_bits + norm_entropy per column
      benford       mad (value_num) + verdict (value_str) per
                    benford column (default: the numeric columns)
      constraints   one row per suggested constraint (value_str
                    carries the detail: range bounds / allowed set)

    Deterministic given the input, so the whole report is
    oracle-replayable; sections compute on the engine's existing
    operators, not bespoke logic.
    """
    from data_validator_spark.operators.drift import benford_test
    from data_validator_spark.operators.stats import entropy_profile
    from data_validator_spark.operators.suggest import suggest_constraints

    spark = df.sparkSession
    cols = list(numeric_cols) + list(string_cols)
    bcols = benford_cols if benford_cols is not None else list(numeric_cols)

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"lo_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"hi_{c}"))
    stats = df.agg(*aggs).collect()[0]

    rows: list[tuple] = []
    n = stats["_n"]
    for c in cols:
        nn, nd = stats[f"nn_{c}"], stats[f"nd_{c}"]
        rows.append(
            ("completeness", c, "null_rate",
             round(1.0 - nn / n, 6) if n else None, None)
        )
        rows.append(("cardinality", c, "n_distinct", float(nd), None))
        rows.append(
            ("cardinality", c, "distinct_ratio",
             round(nd / nn, 6) if nn else None, None)
        )
    for c in numeric_cols:
        rows.append(("range", c, "min", stats[f"lo_{c}"], None))
        rows.append(("range", c, "max", stats[f"hi_{c}"], None))
    scalar = spark.createDataFrame(rows, _REPORT_SCHEMA)

    ent = entropy_profile(df, cols).select(
        F.lit("entropy").alias("section"),
        F.col("column_name"),
        F.lit("entropy_bits").alias("metric"),
        F.col("entropy_bits").alias("value_num"),
        F.lit(None).cast("string").alias("value_str"),
    )
    ben = benford_test(df, bcols).select(
        F.lit("benford").alias("section"),
        F.col("column_name"),
        F.lit("mad").alias("metric"),
        F.col("mad").alias("value_num"),
        F.col("verdict").alias("value_str"),
    ) if bcols else spark.createDataFrame([], _REPORT_SCHEMA)
    cons = suggest_constraints(df, cols=cols, exact=True).select(
        F.lit("constraints").alias("section"),
        F.col("column_name"),
        F.col("constraint").alias("metric"),
        F.col("lo").alias("value_num"),
        F.coalesce(
            F.col("allowed"),
            F.when(
                F.col("hi").isNotNull(),
                F.concat(
                    F.lit("hi="), F.round(F.col("hi"), 6).cast("string")
                ),
            ),
        ).alias("value_str"),
    )
    return reduce(DataFrame.unionByName, [scalar, ent, ben, cons])
