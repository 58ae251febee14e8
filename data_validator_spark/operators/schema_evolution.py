"""Schema-evolution compatibility verdicts.

q61's field-set diff says WHAT changed between two schema eras; this
operator says WHETHER each change is safe, using Iceberg's published
evolution rules as the compatibility contract (the north star's
tables are Iceberg): int->long and float->double are the permitted
type promotions; adding an OPTIONAL field is safe, adding a required
one or removing/narrowing anything is breaking. The reference's
weekly report renders field diffs for humans (weekly_report.py:
632-675); a validator must also emit the verdict.

Inputs are schema TABLES (field, dtype, nullable) — either literal
fixtures, rows persisted by the snapshot store, or extracted from a
live DataFrame via schema_table(). Pure full-outer-join Column
algebra; schemas are hundreds of rows at most, so AQE broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Iceberg spec's allowed primitive promotions (format v2), plus the
# integer ladder below int that Spark types can express.
WIDENINGS: frozenset[tuple[str, str]] = frozenset(
    {
        ("int", "bigint"),
        ("float", "double"),
        ("tinyint", "smallint"),
        ("tinyint", "int"),
        ("tinyint", "bigint"),
        ("smallint", "int"),
        ("smallint", "bigint"),
    }
)

COMPATIBLE = "compatible"
BREAKING = "breaking"


def schema_table(df: DataFrame) -> DataFrame:
    """Extract (field, dtype, nullable) rows from a live DataFrame —
    the shape the snapshot store persists per era."""
    rows = [
        (f.name, f.dataType.simpleString(), bool(f.nullable))
        for f in df.schema.fields
    ]
    return df.sparkSession.createDataFrame(
        rows, "field string, dtype string, nullable boolean"
    )


def schema_compat(base: DataFrame, cur: DataFrame) -> DataFrame:
    """-> (field, change, detail, verdict) for every field present in
    either era. change in {unchanged, added, removed, type_widened,
    type_changed, nullability_relaxed, nullability_tightened}."""
    b = base.select(
        F.col("field"),
        F.col("dtype").alias("b_type"),
        F.col("nullable").alias("b_null"),
    )
    c = cur.select(
        F.col("field"),
        F.col("dtype").alias("c_type"),
        F.col("nullable").alias("c_null"),
    )
    j = b.join(c, "field", "full_outer")
    widened = F.array(
        *[F.lit(f"{a}->{z}") for a, z in sorted(WIDENINGS)]
    )
    pair = F.concat(F.col("b_type"), F.lit("->"), F.col("c_type"))
    change = (
        F.when(F.col("c_type").isNull(), F.lit("removed"))
        .when(F.col("b_type").isNull(), F.lit("added"))
        .when(
            F.col("b_type") != F.col("c_type"),
            F.when(F.array_contains(widened, pair), F.lit("type_widened")).otherwise(
                F.lit("type_changed")
            ),
        )
        .when(~F.col("b_null") & F.col("c_null"), F.lit("nullability_relaxed"))
        .when(F.col("b_null") & ~F.col("c_null"), F.lit("nullability_tightened"))
        .otherwise(F.lit("unchanged"))
    )
    detail = (
        F.when(F.col("c_type").isNull(), F.col("b_type"))
        .when(F.col("b_type").isNull(), F.col("c_type"))
        .when(F.col("b_type") != F.col("c_type"), pair)
        .otherwise(F.col("b_type"))
    )
    verdict = F.when(
        change.isin("removed", "type_changed", "nullability_tightened"),
        F.lit(BREAKING),
    ).otherwise(
        # an added field is only safe when readers may omit it
        F.when(
            (change == "added") & ~F.col("c_null"), F.lit(BREAKING)
        ).otherwise(F.lit(COMPATIBLE))
    )
    return j.select(
        "field",
        change.alias("change"),
        detail.alias("detail"),
        verdict.alias("verdict"),
    )
