"""Skew-aware aggregation: salted two-phase partial/final aggregation.

The clips table's codec/sr_hz distributions are Zipf-skewed by
construction (FIXTURES.md) — a plain groupBy("codec") puts >50% of a
10^12-row table into one reducer. Hash aggregation already does
map-side partial aggregation for algebraic functions, so salting
mostly matters for (a) high-cardinality-value aggs like collect_list /
exact percentile, and (b) per-group pandas stages. This helper makes
the two-phase structure explicit and reusable.

Deterministic salt: pmod(xxhash64(salt_source), n_salt) — no rand(),
so retried tasks (speculative execution / stage retries at cluster
scale) produce identical partitions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum", "count", "min", "max"}


def add_salt(
    df: DataFrame, salt_source: Sequence[str] | None, n_salt: int
) -> DataFrame:
    """salt_source must be high-cardinality (a unique id). None -> hash
    every column (always splits hot groups, at a little extra cost)."""
    src = list(salt_source) if salt_source else df.columns
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in src]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salt)))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
    salt_source: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over skewed `keys`.

    aggs: out_name -> (fn, col) with fn in {sum,count,min,max,avg}.
    avg decomposes into sum+count across the two phases.

    Phase 1 groups by (keys, salt) — hot keys split across n_salt
    reducers; phase 2 merges the (small) per-salt partials.
    """
    salted = add_salt(df, salt_source, n_salt)
    p1: list[Column] = []
    p2: list[Column] = []
    finals: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            p1 += [
                F.sum(col).alias(f"_{out}__s"),
                F.count(col).alias(f"_{out}__c"),
            ]
            p2 += [
                F.sum(f"_{out}__s").alias(f"_{out}__s"),
                F.sum(f"_{out}__c").alias(f"_{out}__c"),
            ]
            finals.append(
                (F.col(f"_{out}__s") / F.col(f"_{out}__c")).alias(out)
            )
        elif fn in _MERGEABLE:
            p1.append(getattr(F, fn)(col).alias(f"_{out}"))
            merge = "sum" if fn in ("sum", "count") else fn
            p2.append(getattr(F, merge)(f"_{out}").alias(f"_{out}"))
            finals.append(F.col(f"_{out}").alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*p1)
    merged = partial.groupBy(*keys).agg(*p2)
    return merged.select(*keys, *finals)
