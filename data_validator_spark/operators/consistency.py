"""Cross-column / cross-table CONSISTENCY checks.

Two rule families the reference enforces imperatively and a
warehouse-scale validator needs as declarative operators:

1. Functional dependencies (fd_violations / fd_profile) — "column A
   determines column B". The reference hard-codes instances of this
   shape (a run's task_id must agree with its variant's task,
   entity_controller.py catalog joins; a user's birth fields must
   agree across duplicate docs); here it is a generic operator: one
   hash aggregate on the determinant, exact distinct count of the
   dependent, violating keys reported with bounded example values.

2. Snapshot reconciliation (reconcile) — "these two tables must agree
   on these measures per key": the post-copy / post-migration audit
   (did the Iceberg rewrite preserve per-partition row counts and
   sums?). Full-outer join on the key, per-measure drilldown with
   absolute + relative tolerance, normalized status labels matching
   the reference's invalid_key/invalid_value verdict-row pattern
   (entity_controller.py:148-191).

Scale notes: fd_violations is a single hash aggregate (map-side
partial combine applies to count/count_distinct via partial
aggregation); example values use sort_array(collect_set)[:k], bounded
by the dependent's per-key distinct cardinality — for FDs that are
nearly true (the only ones worth reporting examples for) that is a
handful of values. reconcile shuffles both sides once on the key; at
10^12-row scale the inputs are per-partition AGGREGATES (counts,
sums), i.e. orders of magnitude smaller than the fact table, and a
small baseline side is broadcast automatically by AQE.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fd_violations(
    df: DataFrame,
    determinant: Sequence[str],
    dependent: str,
    max_examples: int = 0,
) -> DataFrame:
    """Per-determinant-key report of a candidate functional dependency
    `determinant -> dependent`: -> (*determinant, n_rows, n_variants,
    fd_holds boolean [, examples array]).

    A key VIOLATES the FD when its non-null dependent values take more
    than one distinct value. NULL dependents are ignored (their rule
    is completeness, not consistency); rows with any NULL determinant
    column are excluded. max_examples > 0 adds the first k distinct
    dependent values in sorted order — deterministic, so an external
    oracle can replay it.
    """
    det = [F.col(c) for c in determinant]
    d = df
    for c in determinant:
        d = d.filter(F.col(c).isNotNull())
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(F.col(dependent)).cast("long").alias("n_variants"),
    ]
    if max_examples > 0:
        aggs.append(
            F.slice(
                F.sort_array(F.collect_set(F.col(dependent).cast("string"))),
                1,
                max_examples,
            ).alias("examples")
        )
    out = d.groupBy(*det).agg(*aggs)
    return out.withColumn("fd_holds", F.col("n_variants") <= 1)


def fd_profile(
    df_by_name: dict[str, tuple[DataFrame, Sequence[str], str]],
) -> DataFrame:
    """One summary row per candidate FD: -> (fd_name, n_keys,
    n_violating_keys, violation_rate, max_variants).

    Input maps a label to (df, determinant_cols, dependent_col). Each
    candidate costs one hash aggregate on its own determinant; the
    tiny per-FD summaries are unioned. violation_rate is NULL when the
    table has no qualifying keys (ANSI-safe, no divide-by-zero).
    """
    parts = []
    for name, (df, det, dep) in df_by_name.items():
        per_key = fd_violations(df, det, dep)
        parts.append(
            per_key.agg(
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((~F.col("fd_holds")).cast("long"))
                .cast("long")
                .alias("n_violating_keys"),
                F.max("n_variants").cast("long").alias("max_variants"),
            )
            .select(F.lit(name).alias("fd_name"), "*")
            .withColumn(
                "violation_rate",
                F.when(
                    F.col("n_keys") > 0,
                    F.round(F.col("n_violating_keys") / F.col("n_keys"), 6),
                ),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def reconcile(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    abs_tol: float = 0.0,
    rel_tol: float = 0.0,
) -> DataFrame:
    """Key-level reconciliation of two aggregate snapshots: ->
    (*keys, status, measure, left_value, right_value, abs_diff).

    status per key is one of: 'match' (every measure within
    tolerance), 'mismatch' (some measure differs), 'missing_left' /
    'missing_right' (key absent on one side). For mismatching keys a
    row is emitted PER failing measure (measure/left/right/abs_diff
    populated); match/missing rows carry NULL measure detail. A
    measure passes when |l - r| <= abs_tol + rel_tol * max(|l|, |r|)
    (both NULL also passes — absent measure on both sides).
    """
    lpref, rpref = left, right
    for m in measures:
        lpref = lpref.withColumnRenamed(m, f"_l_{m}")
        rpref = rpref.withColumnRenamed(m, f"_r_{m}")
    j = lpref.withColumn("_in_l", F.lit(True)).join(
        rpref.withColumn("_in_r", F.lit(True)), on=list(keys), how="full_outer"
    )

    def _bad(m: str):
        l, r = F.col(f"_l_{m}"), F.col(f"_r_{m}")
        diff = F.abs(l - r)
        tol = F.lit(abs_tol) + F.lit(rel_tol) * F.greatest(F.abs(l), F.abs(r))
        return F.when(l.isNull() & r.isNull(), F.lit(False)).otherwise(
            l.isNull() | r.isNull() | (diff > tol)
        )

    fail_structs = F.filter(
        F.array(
            *[
                F.when(
                    _bad(m),
                    F.struct(
                        F.lit(m).alias("measure"),
                        F.col(f"_l_{m}").cast("double").alias("left_value"),
                        F.col(f"_r_{m}").cast("double").alias("right_value"),
                        F.abs(F.col(f"_l_{m}") - F.col(f"_r_{m}"))
                        .cast("double")
                        .alias("abs_diff"),
                    ),
                )
                for m in measures
            ]
        ),
        lambda s: s.isNotNull(),
    )
    status = (
        F.when(F.col("_in_l").isNull(), F.lit("missing_left"))
        .when(F.col("_in_r").isNull(), F.lit("missing_right"))
        .when(F.size("_fails") > 0, F.lit("mismatch"))
        .otherwise(F.lit("match"))
    )
    with_status = j.withColumn("_fails", fail_structs).withColumn("status", status)
    detail = F.when(
        F.col("status") == "mismatch", F.col("_fails")
    ).otherwise(F.array(F.lit(None).cast(with_status.schema["_fails"].dataType.elementType)))
    exploded = with_status.withColumn("_d", F.explode(detail))
    return exploded.select(
        *keys,
        "status",
        F.col("_d.measure").alias("measure"),
        F.col("_d.left_value").alias("left_value"),
        F.col("_d.right_value").alias("right_value"),
        F.col("_d.abs_diff").alias("abs_diff"),
    )


def table_diff(
    base: DataFrame,
    cur: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level snapshot diff: -> (*keys, status, changed_cols).

    status in {added, removed, changed, unchanged}; changed_cols is
    the comma-joined sorted list of compared columns whose values
    differ (null-safe: NULL == NULL, NULL != value). The audit that
    answers 'what exactly did the rewrite touch' at row granularity —
    reconcile() above answers it at aggregate granularity.

    One full-outer shuffle on the key; every per-column comparison is
    a codegen'd null-safe equality on the joined row, so cost is the
    join itself. At 10^12 rows run it per Iceberg partition (the
    manifest diff already says which partitions changed — unchanged
    partitions never join).
    """
    if compare_cols is None:
        kset = set(keys)
        base_cols = [f.name for f in base.schema.fields if f.name not in kset]
        cur_names = {f.name for f in cur.schema.fields}
        compare_cols = [c for c in base_cols if c in cur_names]
    b = base.select(
        *keys, *[F.col(c).alias(f"_b_{c}") for c in compare_cols]
    ).withColumn("_in_b", F.lit(True))
    c_ = cur.select(
        *keys, *[F.col(c).alias(f"_c_{c}") for c in compare_cols]
    ).withColumn("_in_c", F.lit(True))
    j = b.join(c_, on=list(keys), how="full_outer")
    diffs = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"_b_{c}").eqNullSafe(F.col(f"_c_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        ),
        lambda s: s.isNotNull(),
    )
    status = (
        F.when(F.col("_in_b").isNull(), F.lit("added"))
        .when(F.col("_in_c").isNull(), F.lit("removed"))
        .when(F.size("_diffs") > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("_diffs", diffs)
        .withColumn("status", status)
        .select(
            *keys,
            "status",
            F.when(
                F.col("status") == "changed",
                F.array_join(F.array_sort("_diffs"), ","),
            ).alias("changed_cols"),
        )
    )


def join_audit(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """Pre-join cardinality audit: ONE summary row with
    (n_fact, n_fact_null_fk, n_dim, n_dim_dup_keys, max_fanout,
    n_orphan_fact, coverage_rate, est_join_rows).

    The checks a pipeline should run BEFORE an enrich join ships:
    does the dim key actually identify (n_dim_dup_keys, max_fanout —
    a dup'd dim key silently multiplies fact rows), do the fact FKs
    resolve (n_orphan_fact, coverage_rate over non-null FKs), and how
    many rows will the inner join emit (est_join_rows = sum of
    fk_count * pk_count over matching keys — EXACT, computed from the
    two key-count aggregates joined, never by running the join).

    Cost: one aggregate per side on the key + one join of the two
    key-count tables (each already shrunk to distinct keys, so this
    is orders of magnitude smaller than the join being audited).
    """
    f_keys = (
        fact.filter(F.col(fk).isNotNull())
        .groupBy(F.col(fk).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_cf"))
    )
    d_keys = dim.filter(F.col(pk).isNotNull()).groupBy(
        F.col(pk).alias("_k")
    ).agg(F.count(F.lit(1)).alias("_cd"))
    j = f_keys.join(d_keys, "_k", "full_outer")
    key_stats = j.agg(
        F.sum(F.when(F.col("_cd").isNotNull(), F.col("_cf"))).alias("_covered"),
        F.sum(F.when(F.col("_cd").isNull(), F.col("_cf"))).alias("_orphan"),
        F.sum(F.col("_cf") * F.col("_cd")).alias("_join_rows"),
        F.sum(F.when(F.col("_cd") > 1, 1).otherwise(0)).alias("_dup_keys"),
        F.max(F.col("_cd")).alias("_max_fanout"),
        F.sum("_cd").alias("_n_dim"),
    )
    fact_stats = fact.agg(
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum(F.col(fk).isNull().cast("long")).cast("long").alias("n_fact_null_fk"),
    )
    return fact_stats.crossJoin(F.broadcast(key_stats)).select(
        "n_fact",
        "n_fact_null_fk",
        F.coalesce(F.col("_n_dim"), F.lit(0)).cast("long").alias("n_dim"),
        F.coalesce(F.col("_dup_keys"), F.lit(0)).cast("long").alias("n_dim_dup_keys"),
        F.coalesce(F.col("_max_fanout"), F.lit(0)).cast("long").alias("max_fanout"),
        F.coalesce(F.col("_orphan"), F.lit(0)).cast("long").alias("n_orphan_fact"),
        F.when(
            F.col("n_fact") - F.col("n_fact_null_fk") > 0,
            F.round(
                F.coalesce(F.col("_covered"), F.lit(0))
                / (F.col("n_fact") - F.col("n_fact_null_fk")),
                6,
            ),
        ).alias("coverage_rate"),
        F.coalesce(F.col("_join_rows"), F.lit(0)).cast("long").alias("est_join_rows"),
    )


def freshness_audit(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    max_lag_hours: float = 24.0,
) -> DataFrame:
    """Per-group data freshness: -> (group, n_rows, last_ts, lag_hours,
    stale boolean).

    'Which feeds stopped arriving' — the wall-clock complement of the
    volume control chart (control.ewma_chart). The reference point is
    the table's own global max timestamp, NOT the driver's clock, so
    the audit is deterministic and replayable offline (a feed is
    stale relative to the freshest feed, which is also the only
    defensible definition when the table itself is a frozen
    snapshot). Two aggregates, the one-row global max broadcast.

    A group whose EVERY timestamp is null — a feed that never stamped
    one arrival — still emits its row (n_rows=0, null last_ts /
    lag_hours / stale) rather than silently vanishing from the audit:
    count(ts)/max(ts) ignore nulls, so grouping the unfiltered table
    keeps the dead feed visible at zero extra cost.
    """
    per = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.col(ts_col)).cast("long").alias("n_rows"),
        F.max(ts_col).alias("last_ts"),
    )
    global_max = df.agg(F.max(ts_col).alias("_gmax"))
    # NTZ timestamps can't cast to double under ANSI; go through
    # unix_micros on a TZ cast (the session pins UTC, so NTZ->LTZ is
    # the identity mapping)
    def _us(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp"))

    lag_h = (_us(F.col("_gmax")) - _us(F.col("last_ts"))) / 3.6e9
    return (
        per.crossJoin(F.broadcast(global_max))
        .select(
            F.col("_g").alias(group_col),
            "n_rows",
            "last_ts",
            F.round(lag_h, 6).alias("lag_hours"),
            (lag_h > max_lag_hours).alias("stale"),
        )
    )
