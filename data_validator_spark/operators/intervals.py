"""Interval (range) join without a cartesian: bucketized containment.

Validation-tier use: exclusion/maintenance windows — clips or events
whose timestamp falls inside a published outage window must be
flagged (or excluded from drift baselines). The naive formulation
`points JOIN windows ON ts >= start AND ts < end` has no equi-key,
so Spark plans BroadcastNestedLoopJoin (fine only while windows fit
in a broadcast) or a cartesian — at 10^12 points x 10^4 windows
that is the classic range-join blowup.

Bucketized shape: pick a bucket width; each point hashes to exactly
ONE bucket (floor(ts/width)), each interval explodes to the buckets
it overlaps (ceil(len/width)+1 rows — intervals are short relative
to the bucket in the target workload, so the explosion is a small
constant). The join is then a plain hash equi-join on bucket with
the exact containment predicate as a post-filter. Because a point
owns a single bucket, a (point, interval) pair can meet at most
once — no dedup pass. Same trick Databricks' range-join hints and
every stream-stream interval join use.

Scale notes: bucket width trades explosion factor (long intervals
-> many rows) against join fan-in (wide buckets -> more false
candidates filtered post-join). A burst bucket (skewed key) is
ordinary equi-join skew — AQE's skew-join split applies, nothing
bespoke needed. All comparisons run in the i64 micros domain so the
same operator serves timestamps, byte offsets, or numeric ranges.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PB = "__iv_pbucket"
_IB = "__iv_ibucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start <= point < end (half-open), bucketized as described above.

    `point_col`, `start_col`, `end_col` must be numeric (cast
    timestamps to unix micros first). `keys`: optional extra
    equi-join columns (per-device windows). `how`: inner | left_semi
    | left_anti | left. For `left`, unmatched points carry nulls in
    the interval columns; a point inside k intervals yields k rows
    (inner/left), exactly its own row (semi/anti).
    """
    if how not in ("inner", "left_semi", "left_anti", "left"):
        raise ValueError(f"unsupported how={how!r}")
    keys = list(keys)

    b = F.lit(int(bucket))
    pt = points.withColumn(_PB, F.floor(F.col(point_col) / b).cast("long"))
    # Malformed intervals (end <= start) can never match a point under
    # the half-open predicate — but an unfiltered sequence() would
    # auto-DESCEND from start_bucket to end_bucket (step -1) and
    # explode arbitrarily many spurious bucket rows (or die on the
    # sequence-length cap) before the filter ever ran. Drop them
    # before the explode; for how='left' the POINTS side is intact so
    # unmatched-point semantics are unchanged.
    iv = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = iv.withColumn(
        _IB,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b).cast("long"),
                # end is exclusive: a zero-length or bucket-aligned end
                # still lands in the floor bucket of (end - 1)
                F.floor((F.col(end_col) - 1) / b).cast("long"),
            )
        ),
    ).alias("__iv")
    pt = pt.alias("__pt")

    cond = (
        (F.col(f"__pt.{_PB}") == F.col(f"__iv.{_IB}"))
        & (F.col(f"__pt.{point_col}") >= F.col(f"__iv.{start_col}"))
        & (F.col(f"__pt.{point_col}") < F.col(f"__iv.{end_col}"))
    )
    for k in keys:
        cond = cond & (F.col(f"__pt.{k}") == F.col(f"__iv.{k}"))

    if how in ("left_semi", "left_anti"):
        return pt.join(iv, cond, how).drop(_PB)
    out = pt.join(iv, cond, how)
    return out.drop(_PB, _IB)
