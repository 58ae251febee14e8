"""Column-statistics profiler (the north star's stats surface).

Generalizes the reference's validation-stats rollup
(data_validation_pipeline.py:84-118) and vestigial IQR logic
(validation_controller.py:12-29) into a single-pass column profile:
null rate, min/max, HLL cardinality (`approx_count_distinct`),
quantile sketches (`approx_percentile`), plus fixed-grid histograms
for drift comparison.

Scale notes:
  - the scalar profile is ONE Aggregate over the table (no per-column
    jobs): Catalyst fuses all expressions into a single partial+final
    agg, so cost is a single scan at any table size.
  - histograms for all columns ride ONE shuffle: rows are exploded to
    (column, bucket) pairs first, then a single groupBy aggregates
    every column's histogram together.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANTILES = (0.05, 0.25, 0.5, 0.75, 0.95)


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    kind: str  # "numeric" | "categorical"
    # histogram grid for numeric columns (fixed so baseline/current align)
    bucket_lo: float = 0.0
    bucket_hi: float = 1.0
    n_buckets: int = 20


def profile(
    df: DataFrame,
    specs: Sequence[ColumnSpec],
    quantiles: Sequence[float] = DEFAULT_QUANTILES,
    hll_rsd: float = 0.02,
    quantile_method: str = "approx",
) -> DataFrame:
    """Long-format per-column summary:
    (column_name, null_rate, min_val, max_val, approx_distinct, quantiles).

    min/max are stringified so one schema fits all column types
    (mirrors the reference's stringly typed stats payloads).

    hll_rsd: target relative standard deviation of the HLL++ sketch.
    0.02 costs ~2^13 registers (~8 KB) per column — still a fixed-size
    mergeable sketch at any row count — and keeps the estimate inside
    the engine's ±5% cardinality contract with margin (the 0.05
    default rsd breaches 5% routinely on low-cardinality columns).

    quantile_method: "approx" fuses percentile_approx into the one
    scalar Aggregate (single scan). "tdigest" runs the mergeable
    t-digest (operators/tdigest.py) for numeric columns instead and
    joins its read-out back on — one extra scan, but the per-snapshot
    sketch rows it produces are persistable and mergeable, which is
    what the raw-data-free drift path (drift.sketch_drift) consumes;
    choose it when snapshots are profiled once and compared many
    times."""
    if quantile_method not in ("approx", "tdigest"):
        raise ValueError(f"unknown quantile_method: {quantile_method!r}")
    use_td = quantile_method == "tdigest"
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for s in specs:
        c = F.col(s.name)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"{s.name}__nulls"),
            F.min(c).cast("string").alias(f"{s.name}__min"),
            F.max(c).cast("string").alias(f"{s.name}__max"),
            F.approx_count_distinct(c, rsd=hll_rsd).alias(f"{s.name}__hll"),
        ]
        if s.kind == "numeric" and not use_td:
            aggs.append(
                F.percentile_approx(
                    c.cast("double"), list(quantiles), 10_000
                ).alias(f"{s.name}__q")
            )
    wide = df.agg(*aggs)
    # unpivot wide row -> long rows, still fully in the plan (no collect)
    structs = [
        F.struct(
            F.lit(s.name).alias("column_name"),
            (F.col(f"{s.name}__nulls") / F.greatest(F.col("_n"), F.lit(1))).alias(
                "null_rate"
            ),
            F.col(f"{s.name}__min").alias("min_val"),
            F.col(f"{s.name}__max").alias("max_val"),
            F.col(f"{s.name}__hll").alias("approx_distinct"),
            (
                F.col(f"{s.name}__q")
                if s.kind == "numeric" and not use_td
                else F.lit(None).cast("array<double>")
            ).alias("quantiles"),
            F.col("_n").alias("n_rows"),
        )
        for s in specs
    ]
    out = wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    if not use_td:
        return out
    from .tdigest import quantile_array_readout, tdigest_profile

    num_cols = [s.name for s in specs if s.kind == "numeric"]
    if not num_cols:
        return out
    readout = quantile_array_readout(
        tdigest_profile(df, num_cols), quantiles
    ).withColumnRenamed("quantiles", "_td_q")
    return out.join(F.broadcast(readout), "column_name", "left").select(
        "column_name",
        "null_rate",
        "min_val",
        "max_val",
        "approx_distinct",
        F.coalesce(F.col("_td_q"), F.col("quantiles")).alias("quantiles"),
        "n_rows",
    )


def bucketize(spec: ColumnSpec) -> Column:
    """Fixed-grid bucket id for a numeric column: floor((x-lo)/w) with
    underflow/overflow buckets; NULL rows excluded by histogram()."""
    c = F.col(spec.name).cast("double")
    w = (spec.bucket_hi - spec.bucket_lo) / spec.n_buckets
    raw = F.floor((c - F.lit(spec.bucket_lo)) / F.lit(w))
    clamped = F.greatest(F.lit(-1), F.least(raw, F.lit(spec.n_buckets)))
    return clamped.cast("string")


def histogram(df: DataFrame, specs: Sequence[ColumnSpec]) -> DataFrame:
    """(column_name, bucket, cnt, freq) for every spec in ONE shuffle.

    Numeric columns bucket on the spec's fixed grid (so two snapshots
    are comparable); categorical columns bucket on the value itself.
    """
    pairs = [
        F.struct(
            F.lit(s.name).alias("column_name"),
            (
                bucketize(s)
                if s.kind == "numeric"
                else F.col(s.name).cast("string")
            ).alias("bucket"),
        )
        for s in specs
    ]
    exploded = df.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")
    exploded = exploded.filter(F.col("bucket").isNotNull())
    counts = exploded.groupBy("column_name", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("column_name")
    return counts.withColumn("freq", F.col("cnt") / F.sum("cnt").over(w))
