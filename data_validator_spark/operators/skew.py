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


def salted_self_join(
    banded: DataFrame,
    id_col: str,
    bucket_cols: Sequence[str],
    cap: int = 4096,
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Skew-bounded bucketed self-join: candidate pairs (id_a, id_b)
    with id_a < id_b from rows sharing a bucket key, with hot buckets
    split so no join-key group exceeds ~cap rows per side.

    Buckets with <= cap rows behave exactly like a plain self-join
    (chunk count k=1). Oversized buckets are split into k = ceil(n/cap)
    chunks by a deterministic hash of the id; BOTH sides replicate k
    ways and the join key becomes (bucket, chunk_a, chunk_b), so
    per-key side cardinality drops to ~n/k <= cap while every
    within-bucket pair still meets exactly once per bucket row.
    Replication cost is O(n*k) id-sized rows; the pair output is
    O(n^2) per bucket regardless — the salt bounds the *straggler
    task*, not total work. Deterministic (no rand()), so stage retries
    and speculative tasks reproduce identical partitions.

    Output: one row per (pair, colliding bucket) — callers compute
    their verification scalar (est_jaccard / hamming / cosine), drop
    payloads, then dropDuplicates(["id_a","id_b"]) so the pair-dedup
    shuffle carries only scalars. payload_cols are carried to both
    sides as <col>_a / <col>_b (keep them scalar-sized; signatures and
    vectors should instead be re-joined on the deduped pairs).
    """
    sizes = banded.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bn"))
    hot = (
        sizes.filter(F.col("_bn") > cap)
        .withColumn("_k", F.ceil(F.col("_bn") / cap).cast("int"))
        .drop("_bn")
    )
    bd = (
        banded.join(F.broadcast(hot), list(bucket_cols), "left")
        .withColumn("_k", F.coalesce(F.col("_k"), F.lit(1)))
        .withColumn(
            "_chunk", F.pmod(F.xxhash64(F.col(id_col)), F.col("_k")).cast("int")
        )
    )
    reps = F.explode(F.sequence(F.lit(0), F.col("_k") - 1))
    a = bd.select(
        F.col(id_col).alias("id_a"),
        *bucket_cols,
        F.col("_chunk").alias("_ca"),
        reps.alias("_cb"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    b = bd.select(
        F.col(id_col).alias("id_b"),
        *bucket_cols,
        reps.alias("_ca"),
        F.col("_chunk").alias("_cb"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    join_keys = list(bucket_cols) + ["_ca", "_cb"]
    return (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("_ca", "_cb")
    )


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


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    imbalance_max: float = 10.0,
) -> DataFrame:
    """Shuffle-key skew diagnostics: ONE row with (n_rows, n_keys,
    top_key, max_cnt, max_share, topk_share, imbalance,
    salt_recommended).

    The measurement step BEFORE salted_agg/add_salt above: imbalance
    is max key count over the mean key count — the factor by which
    the hottest reducer outweighs the average one in a plain groupBy/
    join on this key; salt_recommended fires when it exceeds
    imbalance_max. Cost: one hash aggregate on the key, then a
    TakeOrderedAndProject for the top-k counts (never a full sort)
    and a scalar aggregate over the key-count table.
    """
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    top = counts.orderBy(F.col("_c").desc(), F.col("_k").asc()).limit(top_k)
    # top_key via struct-max (count, key): deterministic under ties
    # (largest key string wins), unlike first() over an agg input
    top_agg = top.agg(
        F.sum("_c").alias("_topk"),
        F.max(
            F.struct(F.col("_c"), F.col("_k").cast("string").alias("_ks"))
        ).alias("_m"),
    ).select(
        "_topk",
        F.col("_m._c").alias("_max"),
        F.col("_m._ks").alias("top_key"),
    )
    totals = counts.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    j = totals.crossJoin(F.broadcast(top_agg))
    imbalance = F.col("_max") / (F.col("n_rows") / F.col("n_keys"))
    return j.select(
        "n_rows",
        "n_keys",
        "top_key",
        F.col("_max").cast("long").alias("max_cnt"),
        F.round(F.col("_max") / F.col("n_rows"), 6).alias("max_share"),
        F.round(F.col("_topk") / F.col("n_rows"), 6).alias("topk_share"),
        F.round(imbalance, 6).alias("imbalance"),
        (imbalance > imbalance_max).alias("salt_recommended"),
    )
