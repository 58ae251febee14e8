"""Ordered-sequence rules: run-length detection ("straight-lining").

Reference: check_straight_line_trials (core_models.py:382-412) sorts a
run's trials by trial_index and flags >=10 consecutive identical
non-empty response_location values. Spark form is gaps-and-islands:
lag-change flag -> running sum as island id -> island sizes -> max.
One shuffle on the partition key; every window shares it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def max_run_lengths(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """-> (part_col, max_run): longest run of consecutive identical
    non-null/non-empty `value_col` per partition key, ordered by
    `order_col`. Rows with non-castable order (NULL after cast) are
    excluded, mirroring the reference's non-int trial_index exclusion
    (core_models.py:393-397)."""
    ordered = df.filter(
        F.col(order_col).isNotNull()
        & F.col(value_col).isNotNull()
        & (F.col(value_col).cast("string") != "")
    )
    w = Window.partitionBy(part_col).orderBy(F.col(order_col).asc())
    change = F.when(
        F.lag(value_col).over(w).isNull()
        | (F.col(value_col) != F.lag(value_col).over(w)),
        1,
    ).otherwise(0)
    island = F.sum(change).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_island = ordered.withColumn("_island", island)
    return (
        with_island.groupBy(part_col, "_island")
        .agg(F.count(F.lit(1)).alias("_run"))
        .groupBy(part_col)
        .agg(F.max("_run").alias("max_run"))
    )


def straightlining_flags(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    min_run: int = 10,
    label: str | None = None,
) -> DataFrame:
    """-> (part_col, straightlining boolean, straightlining_msg) —
    the reference emits label 'straightlining_10' for min_run=10."""
    label = label or f"straightlining_{min_run}"
    runs = max_run_lengths(df, part_col, order_col, value_col)
    return runs.select(
        part_col,
        (F.col("max_run") >= min_run).alias("straightlining"),
        F.when(F.col("max_run") >= min_run, F.lit(label)).alias("straightlining_msg"),
    )
