"""Per-group aggregate rules.

A1 (count threshold) and A2 (exact binomial below-chance test) from
SURVEY.md §2.4. The binomial CDF is computed in a vectorized pandas
UDF with log-gamma arithmetic (scipy is not available in this
environment; this reproduces scipy.stats.binomtest(k, n, p,
alternative='less').pvalue, reference core_models.py:312-344).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def count_threshold_flags(
    df: DataFrame,
    part_col: str,
    min_count: int = 10,
    label: str | None = None,
    predicate=None,
) -> DataFrame:
    """-> (part_col, n, flag_msg): label when the per-group count of
    rows matching `predicate` is below `min_count` (reference
    `less_than_10_test_trials`, core_models.py:375-380)."""
    label = label or f"less_than_{min_count}_test_trials"
    base = df.filter(predicate) if predicate is not None else df
    counts = base.groupBy(part_col).agg(F.count(F.lit(1)).alias("n"))
    return counts.withColumn(
        "flag_msg", F.when(F.col("n") < min_count, F.lit(label))
    )


def _binom_cdf_scalar(k: int, n: int, p: float) -> float:
    """P[X <= k], X ~ Binom(n, p) — exact sum via lgamma (stable)."""
    if n <= 0:
        return 1.0
    k = min(int(k), n)
    if k < 0:
        return 0.0
    lp, lq = math.log(p), math.log1p(-p)
    lgn = math.lgamma(n + 1)
    total = 0.0
    for i in range(0, k + 1):
        total += math.exp(
            lgn - math.lgamma(i + 1) - math.lgamma(n - i + 1) + i * lp + (n - i) * lq
        )
    return min(total, 1.0)


@pandas_udf(T.DoubleType())
def binom_cdf_udf(k: pd.Series, n: pd.Series, p: pd.Series) -> pd.Series:
    out = np.empty(len(k), dtype=np.float64)
    kk, nn, pp = k.to_numpy(), n.to_numpy(), p.to_numpy()
    for i in range(len(out)):
        out[i] = _binom_cdf_scalar(int(kk[i]), int(nn[i]), float(pp[i]))
    return pd.Series(out)


def below_chance_flags(
    df: DataFrame,
    part_col: str,
    correct_col: str = "correct",
    p_chance: float = 0.25,
    min_n: int = 8,
    alpha: float = 0.05,
) -> DataFrame:
    """Per-group one-tailed exact binomial test: k = #correct, n =
    #rows; p-value = P[X <= k] under Binom(n, p_chance); flag only when
    n >= min_n (reference compute_below_chance_flags_scipy,
    core_models.py:312-344 — informational column, does not flip valid).

    -> (part_col, n, k, bc_p, bc_p_below)
    """
    agg = df.groupBy(part_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col(correct_col).cast("int"), F.lit(0))).alias("k"),
    )
    with_p = agg.withColumn(
        "bc_p",
        F.when(
            F.col("n") >= min_n,
            binom_cdf_udf(F.col("k"), F.col("n"), F.lit(float(p_chance))),
        ),
    )
    return with_p.withColumn(
        "bc_p_below",
        F.when(F.col("bc_p").isNotNull(), F.col("bc_p") < alpha),
    )
