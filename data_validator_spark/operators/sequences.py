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


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based session assignment: within each key, ordered by
    timestamp, a new session starts whenever the gap to the previous
    row exceeds `gap_us` microseconds. Adds `session_seq` (1-based
    per key). The validation-tier use: ingest-burst detection —
    a device/user whose clips arrive in one anomalous burst (or a
    survey run answered in a single spray) becomes one session whose
    stats downstream rules can threshold, the batch cousin of
    Structured Streaming's session_window.

    Same gaps-and-islands shape as max_run_lengths above: lag-gap
    flag -> running sum. ONE shuffle on the key; both windows share
    the same partitioning so Catalyst plans a single Exchange + sort.
    Ties on ts are ordered by `tiebreak_col` (default: input order
    is unspecified — pass one for deterministic output).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > F.lit(int(gap_us))), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """-> one row per (key, session_seq): event count, span in
    microseconds, first/last event timestamps. Composes sessionize;
    the groupBy reuses the session shuffle's partitioning on the key
    prefix, so no second full Exchange of the event rows."""
    s = sessionize(df, key_col, ts_col, gap_us, tiebreak_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max(ts_us) - F.min(ts_us)).cast("long").alias("span_us"),
        F.min(ts_us).cast("long").alias("start_us"),
        F.max(ts_us).cast("long").alias("end_us"),
    )


def order_violations(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    strict: bool = False,
) -> DataFrame:
    """Per-key monotonicity check: ordered by `order_col`, count the
    adjacent pairs where `value_col` goes DOWN (or fails to strictly
    rise, with strict=True). -> (key, n_rows, n_inversions,
    monotonic boolean).

    The sequence-integrity rule family: ingest_seq must rise with
    ingest time, event-time must rise with a log offset, a revision
    counter must never regress. Rows with a NULL order or value are
    excluded (they belong to the completeness rules, not ordering).
    Same one-shuffle lag-window shape as sessionize above.
    """
    d = df.filter(F.col(order_col).isNotNull() & F.col(value_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    prev = F.lag(value_col).over(w)
    bad = F.when(
        prev.isNotNull()
        & (F.col(value_col) <= prev if strict else F.col(value_col) < prev),
        1,
    ).otherwise(0)
    return (
        d.withColumn("_bad", bad)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_bad").cast("long").alias("n_inversions"),
        )
        .withColumn("monotonic", F.col("n_inversions") == 0)
    )


def gap_report(
    df: DataFrame,
    key_col: str,
    seq_col: str,
) -> DataFrame:
    """Per-key completeness of an integer sequence: -> (key, n_rows,
    n_distinct, min_seq, max_seq, n_gaps, n_missing, n_dups,
    complete boolean).

    The 'did every ingest_seq arrive exactly once' rule: a key is
    complete when its distinct seq values form the full consecutive
    range [min_seq, max_seq] with no duplicates. n_gaps counts gap
    RUNS (adjacent distinct values more than 1 apart), n_missing the
    total absent values, n_dups the surplus rows beyond one per value.
    NULL seq rows are excluded (completeness-of-presence is the null
    rules' job). ONE shuffle: a single lag window on the key computes
    distinct/gap/missing in the same pass as min/max — no separate
    distinct aggregation.
    """
    d = df.filter(F.col(seq_col).isNotNull()).select(
        F.col(key_col).alias("_k"), F.col(seq_col).cast("long").alias("_s")
    )
    w = Window.partitionBy("_k").orderBy(F.col("_s").asc())
    prev = F.lag("_s").over(w)
    is_new = prev.isNull() | (F.col("_s") != prev)
    gap = (prev.isNotNull() & (F.col("_s") - prev > 1)).cast("long")
    missing = F.greatest(F.lit(0), F.col("_s") - prev - 1)
    return (
        d.select(
            "_k",
            "_s",
            is_new.cast("long").alias("_new"),
            gap.alias("_gap"),
            missing.alias("_miss"),
        )
        .groupBy(F.col("_k").alias(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_new").cast("long").alias("n_distinct"),
            F.min("_s").cast("long").alias("min_seq"),
            F.max("_s").cast("long").alias("max_seq"),
            F.sum("_gap").cast("long").alias("n_gaps"),
            F.sum("_miss").cast("long").alias("n_missing"),
        )
        .withColumn("n_dups", F.col("n_rows") - F.col("n_distinct"))
        .withColumn(
            "complete", (F.col("n_missing") == 0) & (F.col("n_dups") == 0)
        )
    )


def burst_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_s: float,
    threshold: int,
) -> DataFrame:
    """Per-key event-burst detection: -> (key, n_rows, max_burst,
    n_burst_rows, bursty boolean).

    max_burst is the largest number of events from one key inside any
    trailing `window_s`-second window (exact, via a RANGE frame over
    the epoch-seconds ordering — every event evaluates its own
    trailing window, so no bucket-boundary misses); n_burst_rows
    counts events whose trailing window breached `threshold`. The
    duplicate-storm / retry-loop / scraper rule: a key POSTing 500
    clips in a minute is a pipeline defect even when every row is
    individually valid. ONE shuffle on the key; the range frame
    reuses it.
    """
    d = df.filter(F.col(ts_col).isNotNull()).withColumn(
        "_t", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_t").asc())
        .rangeBetween(-int(window_s * 1_000_000), 0)
    )
    with_burst = d.withColumn("_burst", F.count(F.lit(1)).over(w))
    return (
        with_burst.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max("_burst").cast("long").alias("max_burst"),
            F.sum((F.col("_burst") > threshold).cast("long"))
            .cast("long")
            .alias("n_burst_rows"),
        )
        .withColumn("bursty", F.col("max_burst") > threshold)
    )
