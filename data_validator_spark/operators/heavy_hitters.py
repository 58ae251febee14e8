"""Mergeable heavy-hitters summary (Misra–Gries / mergeable k-counters).

The drift surface tracks codec frequencies with an exact groupBy —
fine at codec cardinality, wrong for high-cardinality columns
(user ids, session keys) where "which values dominate?" is the
validation question but the exact histogram is itself a 10^9-row
result. Misra–Gries answers it with a fixed-size summary:

  guarantee (Agarwal et al., "Mergeable Summaries", PODS'12): after
  arbitrary merging of MG(k) summaries over n total rows, every item
  with true count > n/(k+1) is present, and each reported estimate
  satisfies  true − n/(k+1) ≤ est ≤ true.

Distributed shape: map-side partials compress each Arrow batch to ≤ k
(item, count) rows (vectorized value_counts + one np.partition — no
python loop over rows); the shuffle carries only those sketch rows,
grouped per key; the final per-group trim happens over ≤ k·batches
tiny rows. Row totals ride the same pass as sentinel rows, so n (and
with it the error bound) is exact without a second scan.

Oracle: q75 replays exact counts in DuckDB and checks containment
(every true heavy item is reported) plus both bound inequalities.

Reference counterpart: the reference's per-value frequency maps in
weekly reporting (weekly_report.py:217-283) — driver-side Counters
there, a mergeable bounded summary here.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 100


def _mg_trim(items: np.ndarray, counts: np.ndarray, k: int):
    """Keep ≤ k entries: subtract the (k+1)-th largest count from all
    and drop non-positives — the Misra–Gries decrement step, batched."""
    if len(items) <= k:
        return items, counts
    d = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    est = counts - d
    keep = est > 0
    return items[keep], est[keep]


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = DEFAULT_K,
    group_by: Sequence[str] | None = None,
) -> DataFrame:
    """(group cols..., item, est_count, n, err_bound) — at most k item
    rows per group; err_bound = floor(n/(k+1)) is the worst-case
    undercount, and any item whose true count exceeds it is guaranteed
    to appear."""
    groups = list(group_by or [])
    gsel = [F.col(g).cast("string").alias(g) for g in groups]
    proj = df.select(*gsel, F.col(col).cast("string").alias("_item"))

    part_schema = (
        ", ".join(f"{g} string" for g in groups) + ", " if groups else ""
    ) + "_item string, _cnt long"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # coalesce the session's tiny payload-sized Arrow batches to
        # ~64k-row chunks, fold each chunk's value_counts into a
        # per-group running summary (trimmed to 4k entries whenever it
        # grows past 8 partial counts — intermediate trims to k' ≥ k
        # keep the MG bound), and emit ONCE per partition
        _FLUSH_ROWS = 1 << 16
        acc: dict[tuple, list[pd.Series]] = {}
        ns: dict[tuple, int] = {}
        buf: list[pd.DataFrame] = []
        buf_rows = 0

        def _compact(key: tuple, final: bool) -> None:
            merged = pd.concat(acc[key]).groupby(level=0).sum()
            items, counts = _mg_trim(
                merged.index.to_numpy(),
                merged.to_numpy(np.int64),
                k if final else max(k, 4096),
            )
            acc[key] = [pd.Series(counts, index=items)]

        def _flush() -> None:
            nonlocal buf, buf_rows
            if not buf:
                return
            pdf = buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
            buf, buf_rows = [], 0
            by = (
                pdf.groupby(groups, dropna=False, sort=False)
                if groups
                else [((), pdf)]
            )
            for key, sub in by:
                key = key if isinstance(key, tuple) else (key,)
                # nulls are excluded — their share is profile()'s
                # null_rate, and the None item slot is the n-sentinel
                vc = sub["_item"].value_counts()
                ns[key] = ns.get(key, 0) + int(vc.sum())
                lst = acc.setdefault(key, [])
                lst.append(vc)
                if len(lst) > 8:
                    _compact(key, final=False)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            buf.append(pdf)
            buf_rows += len(pdf)
            if buf_rows >= _FLUSH_ROWS:
                _flush()
        _flush()
        out = []
        for key in acc:
            _compact(key, final=True)
            head = dict(zip(groups, key))
            for it, c in acc[key][0].items():
                out.append({**head, "_item": it, "_cnt": int(c)})
            # sentinel row carries the exact non-null row total
            out.append({**head, "_item": None, "_cnt": ns[key]})
        if out:
            yield pd.DataFrame(out)

    parts = proj.mapInPandas(partials, schema=part_schema)
    summed = parts.groupBy(*groups, "_item").agg(F.sum("_cnt").alias("_cnt"))

    out_schema = (
        ", ".join(f"{g} string" for g in groups) + ", " if groups else ""
    ) + "item string, est_count long, n long, err_bound long"

    def trim_group(pdf: pd.DataFrame) -> pd.DataFrame:
        head = {g: pdf[g].iloc[0] for g in groups}
        sent = pdf["_item"].isna()
        n = int(pdf.loc[sent, "_cnt"].sum())
        live = pdf[~sent]
        items, counts = _mg_trim(
            live["_item"].to_numpy(), live["_cnt"].to_numpy(np.int64), k
        )
        bound = n // (k + 1)
        return pd.DataFrame(
            [
                {
                    **head,
                    "item": it,
                    "est_count": int(c),
                    "n": n,
                    "err_bound": bound,
                }
                for it, c in zip(items, counts)
            ]
        )

    if groups:
        return summed.groupBy(*groups).applyInPandas(trim_group, out_schema)
    return summed.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: trim_group(pdf.drop(columns=["_g"], errors="ignore")),
        out_schema,
    )
