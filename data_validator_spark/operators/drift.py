"""Distribution-drift checks: PSI and KS against a baseline snapshot.

Generalizes the reference's week-over-week snapshot diffing
(weekly_report.py:217-283 activity deltas, :632-675 schema drift)
from set/count arithmetic to distributional tests, as the north star
requires (KS / PSI on dur_ms, sr_hz, codec frequencies).

Everything is DataFrame arithmetic over the histogram tables produced
by operators.stats.histogram — a full-outer join on (column, bucket)
plus window cumsums. No driver-side math, so baselines of any width
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPS = 1e-6


def drift_metrics(baseline_hist: DataFrame, current_hist: DataFrame) -> DataFrame:
    """Per-column drift metrics from two histogram tables
    (column_name, bucket, cnt, freq).

    PSI  = sum((p_cur - p_base) * ln(p_cur / p_base)), eps-smoothed.
    KS   = max |CDF_cur - CDF_base| over the shared bucket grid
           (buckets are ordinal for numeric specs; for categorical
           columns KS is reported over lexicographic bucket order and
           PSI is the meaningful statistic).

    Returns (column_name, psi, ks, n_buckets).
    """
    b = baseline_hist.select(
        "column_name", "bucket", F.col("freq").alias("p_base")
    )
    c = current_hist.select(
        "column_name", "bucket", F.col("freq").alias("p_cur")
    )
    joined = b.join(c, ["column_name", "bucket"], "full_outer").fillna(
        0.0, subset=["p_base", "p_cur"]
    )
    pb = F.col("p_base") + _EPS
    pc = F.col("p_cur") + _EPS
    term = (pc - pb) * F.log(pc / pb)

    # numeric buckets sort numerically (-1 underflow .. n overflow);
    # categorical buckets sort lexicographically (a column's buckets
    # are homogeneous, so the numeric key is all-null for categorical
    # and the string tiebreak takes over)
    w = Window.partitionBy("column_name").orderBy(
        F.col("bucket").try_cast("double").asc_nulls_last(),
        F.col("bucket").asc(),
    )
    cdf_gap = F.abs(
        F.sum("p_cur").over(w) - F.sum("p_base").over(w)
    )
    return (
        joined.withColumn("_psi_term", term)
        .withColumn("_cdf_gap", cdf_gap)
        .groupBy("column_name")
        .agg(
            F.sum("_psi_term").alias("psi"),
            F.max("_cdf_gap").alias("ks"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


def drift_verdicts(
    baseline_hist: DataFrame,
    current_hist: DataFrame,
    psi_warn: float = 0.1,
    psi_fail: float = 0.25,
    ks_fail: float = 0.2,
) -> DataFrame:
    """PSI thresholds follow the conventional 0.1/0.25 bands; both
    knobs are config. Status: 'pass' | 'warn' | 'fail'."""
    m = drift_metrics(baseline_hist, current_hist)
    return m.withColumn(
        "drift_status",
        F.when(
            (F.col("psi") >= psi_fail) | (F.col("ks") >= ks_fail), F.lit("fail")
        )
        .when(F.col("psi") >= psi_warn, F.lit("warn"))
        .otherwise(F.lit("pass")),
    )
