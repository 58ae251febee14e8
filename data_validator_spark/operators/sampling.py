"""Sampling operators (SURVEY.md §2.6).

The reference's samples are driver-side `random.sample` / quota loops
(firestore_services.py:680-769, 886-888). Spark-side both become
window/hash computations. Two determinism regimes:

  - hash-deterministic (md5/xxhash over the row key): reproducible
    across engines AND runs — used for oracle-checked sampling.
  - seeded rand(seed): reproducible within Spark only.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, key_cols: Sequence[str], fraction: float) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose md5(key) bucket
    falls under the threshold. Engine-agnostic (md5 on both Spark and
    DuckDB), stable under re-runs and repartitioning."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    bucket = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long")
    return df.filter(bucket < int(fraction * 65536))


def exact_random_sample(
    df: DataFrame, n: int, seed: int, order_within: str | None = None
) -> DataFrame:
    """Exact-size uniform sample (R1: random.sample to a limit),
    seeded for determinism, WITHOUT a global sort.

    Plan shape: rows get _r = rand(seed); a map-side threshold filter
    keeps only rows with _r below ~ (n/total)*(1 + 5/sqrt(n)) — an
    over-draw whose shortfall probability is ~Phi(-5) ~ 3e-7 — and the
    exact top-n over that ~n-row remnant runs as TakeOrderedAndProject
    (per-partition top-n, driver merge), never an Exchange+Sort of the
    full table. On the astronomically-rare shortfall (checked: the
    remnant is counted, it is tiny) the full orderBy path is the
    fallback, so the result is ALWAYS exactly min(n, total) rows.

    The earlier form — orderBy(rand).limit(n) directly — falls back to
    a global sort when n exceeds spark.sql.execution.topKSortFallback-
    Threshold; the threshold filter keeps the sorted set O(n)
    regardless of table size (two scans of the input: count + filter).
    """
    total = df.count()
    if total <= n:
        return df
    order_cols = [F.col(order_within)] if order_within else []
    r = df.withColumn("_r", F.rand(seed))
    frac = n / total
    cutoff = min(1.0, frac * (1.0 + 5.0 / max(1.0, n) ** 0.5) + 1e-9)
    cand = r.filter(F.col("_r") <= cutoff)
    if cand.count() >= n:
        r = cand
    return (
        r.orderBy(F.col("_r"), *order_cols)
        .limit(n)
        .drop("_r")
    )


def stratified_quota_sample(
    df: DataFrame,
    strata_col: str,
    quotas: Mapping[str, int],
    key_cols: Sequence[str],
) -> DataFrame:
    """Exact per-stratum quotas (R2's 40/40/20 stratified user limit,
    firestore_services.py:680-769): rank rows inside each stratum by a
    deterministic hash of their key and keep the first `quota`.

    Under-full strata yield what they have (the reference logs, does
    not refill — VALIDATION_RULES.md:80-92). `sampleBy` is only
    approximate, hence the window construction.
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    w = Window.partitionBy(strata_col).orderBy(F.md5(key))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    quota_expr = None
    for stratum, q in quotas.items():
        cond = (F.col(strata_col) == stratum) & (F.col("_rn") <= q)
        quota_expr = cond if quota_expr is None else (quota_expr | cond)
    if quota_expr is None:
        return df.limit(0)
    return ranked.filter(quota_expr).drop("_rn")


def dependent_quota_sample(
    children: DataFrame,
    parents: DataFrame,
    child_strata_col: str,
    child_quotas: Mapping[str, int],
    child_key_cols: Sequence[str],
    link_col: str,
    parent_key_col: str,
    parent_strata_col: str,
    parent_quotas: Mapping[str, int],
    parent_key_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """R2's DEPENDENT second stratum (firestore_services.py:680-769):
    the reference's 40/40/20 sample picks students by quota first, then
    samples parents only among the parents OF THE PICKED students
    (join at :727-747) — the parent stratum's population depends on the
    child draw, it is not an independent quota over all parents.

    Spark-side: child quota sample (deterministic md5 ranking), then a
    left-semi join restricting parents to those referenced by picked
    children (children.link_col -> parents.parent_key_col), then the
    parent quota over that restricted population with the same
    hash-deterministic ranking. Under-full strata yield what they have
    (the reference logs, does not refill — VALIDATION_RULES.md:80-92).

    Returns (sampled_children, sampled_parents). Both samples are
    reproducible across engines (md5 ranking, no rand()), so a DuckDB
    oracle can replay the full dependency chain.
    """
    kids = stratified_quota_sample(
        children, child_strata_col, child_quotas, child_key_cols
    )
    picked_refs = kids.select(
        F.col(link_col).alias(parent_key_col)
    ).dropDuplicates([parent_key_col])
    eligible = parents.join(picked_refs, parent_key_col, "left_semi")
    pars = stratified_quota_sample(
        eligible, parent_strata_col, parent_quotas, parent_key_cols
    )
    return kids, pars


def recent_n_per_group(
    df: DataFrame, group_col: str, ts_col: str, n: int
) -> DataFrame:
    """R3: N most recent rows per group (schema-drift doc sampling,
    weekly_report.py:519-555)."""
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col).desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")
