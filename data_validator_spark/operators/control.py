"""EWMA control chart over per-snapshot metric series.

The monitoring tier above the drift tests: KS/PSI compare two
snapshots, a control chart watches the whole HISTORY of a metric
(daily row counts, null rates, partition verdict ratios — the
metrics the manifest/snapshot store already persists) and flags the
points where the exponentially-weighted mean exits the +/- L sigma
envelope (Roberts 1959; NIST/SEMATECH 6.3.2.4 is the public spec).

Determinism contract: the EWMA is defined as a TRUNCATED convolution
over the last `lookback+1` points (tail weight below (1-alpha)^K,
~6e-7 at the defaults) computed from an explicit window array — a
pure arithmetic expression any engine replays, instead of a
recursive state no SQL oracle could reproduce. Weights for a window
of m points ending at t (arr[0] oldest):

    w(0)   = (1-a)^(m-1)        when the window reaches the series
                                start (t+1 == m): the first point
                                carries the full remaining mass
           = a * (1-a)^(m-1)    when truncated
    w(j>0) = a * (1-a)^(m-1-j)

Control limits use the standard time-varying EWMA variance
sigma^2 * a/(2-a) * (1 - (1-a)^(2(t+1))) with per-series mu/sigma
estimated from the series itself.

Scale: ONE shuffle on the series key; the window array is at most
lookback+1 doubles; mu/sigma ride the same partitioning as window
aggregates. Series here are per-partition METRICS (one row per
snapshot), orders of magnitude smaller than the fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_chart(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.2,
    n_sigma: float = 3.0,
    lookback: int = 64,
    limits_from_history: bool = False,
) -> DataFrame:
    """-> input columns + (t, ewma, mu, sigma, ucl, lcl,
    out_of_control). NULL values are excluded up front; a series with
    zero variance never flags (its envelope is degenerate and every
    point sits on it).

    limits_from_history=True switches to phase-II charting: each
    point's mu/sigma come from STRICTLY EARLIER points only. The
    default whole-series limits are right for retrospective audits,
    but for live monitoring they let a large regression inflate its
    own sigma enough to hide inside the widened envelope (a single
    end-of-series spike R against near-zero history yields
    sigma ~ 0.3R — the flag margin collapses to an ulp). With
    history-only limits the spike is judged against the clean
    baseline's tight envelope. The first point of a series has no
    history (null sigma) and never flags."""
    a = float(alpha)
    d = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(series_col).orderBy(F.col(order_col).asc())
    w_arr = w.rowsBetween(-lookback, 0)
    w_limits = (
        w.rowsBetween(Window.unboundedPreceding, -1)
        if limits_from_history
        else w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    x = F.col(value_col).cast("double")
    with_arr = d.withColumns(
        {
            "t": F.row_number().over(w) - 1,
            "_arr": F.collect_list(x).over(w_arr),
            "mu": F.avg(x).over(w_limits),
            "sigma": F.stddev_samp(x).over(w_limits),
        }
    )
    m = F.size("_arr")
    # weight for 0-based index j in a window of m points ending at t
    ewma = F.aggregate(
        F.zip_with(
            F.col("_arr"),
            F.sequence(F.lit(0), m - 1),
            lambda v, j: v
            * F.when(
                (j == 0) & (F.col("t") + 1 == m),
                F.pow(F.lit(1 - a), m - 1),
            ).otherwise(F.lit(a) * F.pow(F.lit(1 - a), m - 1 - j)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    half_width = (
        F.lit(n_sigma)
        * F.col("sigma")
        * F.sqrt(
            F.lit(a / (2 - a))
            * (F.lit(1.0) - F.pow(F.lit((1 - a) ** 2), F.col("t") + 1))
        )
    )
    return (
        with_arr.withColumn("ewma", ewma)
        .withColumn("ucl", F.col("mu") + half_width)
        .withColumn("lcl", F.col("mu") - half_width)
        .withColumn(
            "out_of_control",
            # zero-variance handling: the envelope is zero-width and
            # the truncated-convolution ewma can miss mu by an ulp, so
            # a constant series never flags — but a point that TRULY
            # departs from a zero-variance baseline (ewma beyond a
            # relative-epsilon band around mu) is the strongest
            # possible signal and must flag (phase-II watch: a clean
            # history can legitimately be exactly constant).
            F.coalesce(
                F.when(
                    F.col("sigma") > 0,
                    (F.col("ewma") > F.col("ucl"))
                    | (F.col("ewma") < F.col("lcl")),
                ).otherwise(
                    F.abs(F.col("ewma") - F.col("mu"))
                    > F.lit(1e-9) + F.lit(1e-9) * F.abs(F.col("mu"))
                ),
                F.lit(False),
            ),
        )
        .drop("_arr")
    )


def manifest_monitor(
    manifest_df: DataFrame,
    alpha: float = 0.2,
    n_sigma: float = 3.0,
    lookback: int = 64,
    limits_from_history: bool = False,
) -> DataFrame:
    """EWMA control charts over the engine's OWN checkpoint metrics:
    the manifest (plans/manifest.py) already persists per-partition
    n_rows and violation counts with every resumable run — this turns
    that history into monitored series without touching raw data.

    Series charted per partition_value ordering: row volume,
    soft-invalid rate, hard-invalid rate, warning rate. -> ewma_chart
    columns plus `metric`; a partition whose quality regressed shows
    up as out_of_control on its rate series even when every
    individual rule still passes its own threshold.
    """
    rates = manifest_df.select(
        F.col("partition_value"),
        F.col("n_rows").cast("double").alias("row_volume"),
        (F.col("n_soft_invalid") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
            "soft_invalid_rate"
        ),
        (F.col("n_hard_invalid") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
            "hard_invalid_rate"
        ),
        (F.col("n_warnings") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
            "warning_rate"
        ),
    ).unpivot(
        ["partition_value"],
        ["row_volume", "soft_invalid_rate", "hard_invalid_rate", "warning_rate"],
        "metric",
        "x",
    )
    return ewma_chart(
        rates,
        "metric",
        "partition_value",
        "x",
        alpha=alpha,
        n_sigma=n_sigma,
        lookback=lookback,
        limits_from_history=limits_from_history,
    )
