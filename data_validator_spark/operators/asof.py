"""As-of (point-in-time) join: attach to every left row the most
recent right row at-or-before its timestamp, per key.

The validation-tier use case: align each incoming measurement with
the baseline snapshot / revision in effect at its ingest time —
e.g. validate a clip against the transcript revision that was live
when the clip arrived, or score a drift metric against the most
recent committed profile (reference pattern: the survey pipeline
re-reads the "current" validator state per run, main.py's
per-dataset revalidation loop; here that becomes one relational op).

Scale design — why NOT a range join: the naive formulation
(left JOIN right ON key AND r.ts <= l.ts, then argmax per left row)
explodes to O(|left| x avg right-rows-per-key) intermediate rows
before the argmax prunes them. Instead this is the classic
union-and-ordered-scan form:

  1. union left and right rows into one relation tagged by side,
  2. one shuffle on the key, sort within each key by
     (ts, side, right-ts) — rights sort BEFORE lefts at equal ts so
     "at-or-before" includes exact ties,
  3. a running `last(right_payload, ignorenulls=True)` window fills
     every left row with the latest preceding right payload,
  4. keep the left rows.

Exactly one Exchange (hash on key), no row multiplication, and the
within-partition sort is the same work a sort-merge join would do.
Skewed keys cost what any per-key window costs; at 10^12 rows the
key (user/device/dataset id) has bounded per-key cardinality, which
is the regime this targets.

Determinism at ties: if several right rows share (key, ts) the
winner is the greatest by the struct of `right_cols` in order —
callers that need a specific winner should pre-aggregate rights to
one row per (key, ts), which is also what the DuckDB ASOF oracle
requires for a stable comparison. Output column names: `right_cols`
must not collide with `left` columns (rename before joining).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RPAY = "__asof_rpay"
_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of-backward join.

    Returns `left`'s columns plus `right_cols` (null when no right
    row at-or-before the left timestamp exists for the key) plus
    `asof_lag_us` (microseconds from the matched right row to the
    left row; null when unmatched).

    `tolerance`: optional Column (microseconds, compared against
    `asof_lag_us`) — matches older than the tolerance are nulled
    out, NOT dropped (the left row survives unmatched), mirroring
    pandas.merge_asof(tolerance=...).
    """
    on = list(on)
    right_cols = list(right_cols)

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias(_TS),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
            )
            + f",__rts:{right.schema[right_ts].dataType.simpleString()}>"
        )
        .alias(_RPAY),
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in on],
        *[F.col(c) for c in on],
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(_TS),
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_ts).alias("__rts"),
        ).alias(_RPAY),
    ).select(*lhs.columns)  # align column order for the union

    unioned = lhs.unionByName(rhs)
    # rights (side 0) before lefts (side 1) at equal ts => ties match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_RPAY).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(_RPAY, F.last(_RPAY, ignorenulls=True).over(w))

    # parquet timestamps load as TIMESTAMP_NTZ, which unix_micros
    # rejects; cast both sides identically so any tz shift cancels
    lag_us = F.unix_micros(F.col(_TS).cast("timestamp")) - F.unix_micros(
        F.col(_RPAY)["__rts"].cast("timestamp")
    )
    if tolerance is not None:
        keep = lag_us <= tolerance
    else:
        keep = F.lit(True)
    out = filled.filter(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(keep, F.col(_RPAY)[c]).alias(c)
            for c in right_cols
        ],
        F.when(keep, lag_us).cast("long").alias("asof_lag_us"),
    )
    return out
