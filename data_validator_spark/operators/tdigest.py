"""Mergeable t-digest quantile sketch (Dunning & Ertl's k1 scale).

The north star names "quantiles via t-digest/approx_percentile"; the
profiler (operators/stats.py) covers the built-in sketch, this module
adds a REAL t-digest: a fixed-size, associative-mergeable centroid
summary with rank error concentrated where t-digests shine — the
tails (the k1 scale function k(q) = δ/(2π)·asin(2q−1) sizes clusters
∝ sqrt(q(1−q)), so q=0.001 is resolved ~16x finer than q=0.5 at the
same sketch size).

Distributed shape (the 100-TB path):
  stage 1 — map-side partials: each Arrow batch sorts its values and
      compresses them into ≤ δ/2 centroids against the k1 cluster
      boundaries (numpy add.reduceat, no python loop over rows); the
      output is one tiny sketch row (two float arrays + min/max/n)
      per (group, batch).
  stage 2 — sketch merge: partial sketches shuffle BY GROUP (the
      shuffle carries kilobyte sketch rows, never values) and merge
      via a weighted stratified re-cluster — deterministic,
      associative and commutative, so the same merge serves tree
      reduction, cross-snapshot unioning, and incremental updates.

Accuracy contract used by the oracle (q71): with δ=200, every
estimated quantile p lands between the EXACT (p−0.02) and (p+0.02)
quantiles — a rank-error statement, which is the guarantee t-digests
actually make (value error follows from local density).

Reference counterpart: the per-column quantile stats of the
validation rollup (data_validation_pipeline.py:84-118) — re-expressed
as a mergeable sketch so per-partition stats compose without a second
pass over data.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DELTA = 200

_SKETCH_FIELDS = (
    "n long, vmin double, vmax double, "
    "means array<double>, weights array<double>"
)


def _q_bounds(delta: int) -> np.ndarray:
    """k1-scale cluster boundaries: solving k(q_j) − k(0) = j for the
    scale k(q) = δ/(2π)·asin(2q−1) gives q_j = (1 − cos(2πj/δ))/2,
    j = 0..δ/2 — δ/2 clusters, tail clusters ~(π j/δ)² wide."""
    j = np.arange(delta // 2 + 1)
    return (1.0 - np.cos(2.0 * np.pi * j / delta)) / 2.0


def _compress_sorted(
    values: np.ndarray, weights: np.ndarray | None, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (values, weights) -> (means, weights) with ≤ δ/2
    centroids, clustered on the k1 boundaries in rank space.

    Unit-weight batch build: boundaries map to ranks and one
    add.reduceat computes every centroid. Weighted merge input:
    centroids are atomic, so each is assigned to the cluster of its
    LEFT cumulative quantile (the stratified-merge rule) and reduced
    with bincount — still no python loop.
    """
    n = len(values)
    if n == 0:
        return np.zeros(0), np.zeros(0)
    qb = _q_bounds(delta)
    if weights is None:
        ranks = np.unique(np.round(qb * n).astype(np.int64))
        ranks = ranks[(ranks >= 0) & (ranks < n)]
        if ranks[0] != 0:
            ranks = np.concatenate([[0], ranks])
        sums = np.add.reduceat(values, ranks)
        cnts = np.diff(np.concatenate([ranks, [n]])).astype(np.float64)
        return sums / cnts, cnts
    total = float(weights.sum())
    q_left = np.concatenate([[0.0], np.cumsum(weights)[:-1]]) / total
    cluster = np.clip(
        np.searchsorted(qb, q_left, side="right") - 1, 0, len(qb) - 2
    )
    w_out = np.bincount(cluster, weights=weights, minlength=len(qb) - 1)
    s_out = np.bincount(cluster, weights=weights * values, minlength=len(qb) - 1)
    keep = w_out > 0
    return s_out[keep] / w_out[keep], w_out[keep]


def sketch_series(values: np.ndarray, delta: int = DEFAULT_DELTA) -> dict:
    """One t-digest sketch row (python dict) from a value array."""
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return {"n": 0, "vmin": None, "vmax": None, "means": [], "weights": []}
    v = np.sort(v)
    means, weights = _compress_sorted(v, None, delta)
    return {
        "n": int(len(v)),
        "vmin": float(v[0]),
        "vmax": float(v[-1]),
        "means": means.tolist(),
        "weights": weights.tolist(),
    }


def merge_sketch_rows(rows: pd.DataFrame, delta: int = DEFAULT_DELTA) -> dict:
    """Merge sketch rows (columns n/vmin/vmax/means/weights) into one."""
    live = rows[rows["n"] > 0]
    if len(live) == 0:
        return {"n": 0, "vmin": None, "vmax": None, "means": [], "weights": []}
    means = np.concatenate([np.asarray(m, np.float64) for m in live["means"]])
    weights = np.concatenate(
        [np.asarray(w, np.float64) for w in live["weights"]]
    )
    order = np.argsort(means, kind="stable")
    m, w = _compress_sorted(means[order], weights[order], delta)
    return {
        "n": int(live["n"].sum()),
        "vmin": float(live["vmin"].min()),
        "vmax": float(live["vmax"].max()),
        "means": m.tolist(),
        "weights": w.tolist(),
    }


def quantile_from_sketch(
    sketch: dict, probs: Sequence[float]
) -> list[float | None]:
    """Estimate quantiles from a sketch row: centroids are mass points
    at their means; interpolate linearly between adjacent centroid
    mid-ranks, anchored at vmin/vmax for the outer halves."""
    w = np.asarray(sketch["weights"], np.float64)
    m = np.asarray(sketch["means"], np.float64)
    if len(w) == 0:
        return [None for _ in probs]
    total = w.sum()
    cum = np.cumsum(w)
    mids = cum - w / 2.0
    xs = np.concatenate([[0.0], mids, [total]])
    ys = np.concatenate([[sketch["vmin"]], m, [sketch["vmax"]]])
    t = np.asarray(probs, np.float64) * total
    return np.interp(t, xs, ys).tolist()


def tdigest_sketch(
    df: DataFrame,
    col: str,
    group_by: Sequence[str] | None = None,
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Distributed t-digest per group (one global row when group_by is
    None): map-side partial sketches per Arrow batch, then a
    sketch-only shuffle + merge per group. Output columns:
    group cols..., n, vmin, vmax, means, weights."""
    groups = list(group_by or [])
    gsel = [F.col(g).cast("string").alias(g) for g in groups]
    proj = df.select(*gsel, F.col(col).cast("double").alias("_v"))

    part_schema = (
        ", ".join(f"{g} string" for g in groups) + ", " if groups else ""
    ) + _SKETCH_FIELDS

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Arrow batches are deliberately small in this session (payload-
        # safe maxRecordsPerBatch) — so accumulate per-batch sketches
        # across the WHOLE partition and emit once, compacting any
        # group's partial list whenever it grows past _CAP (keeps
        # memory at O(groups · δ) no matter how long the partition is).
        _CAP = 64
        _FLUSH_ROWS = 1 << 16
        acc: dict[tuple, list[dict]] = {}
        buf: list[pd.DataFrame] = []
        buf_rows = 0

        def _add(key: tuple, sk: dict) -> None:
            lst = acc.setdefault(key, [])
            lst.append(sk)
            if len(lst) > _CAP:
                acc[key] = [merge_sketch_rows(pd.DataFrame(lst), delta)]

        def _flush() -> None:
            nonlocal buf, buf_rows
            if not buf:
                return
            pdf = buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
            buf, buf_rows = [], 0
            if groups:
                for key, sub in pdf.groupby(groups, dropna=False, sort=False):
                    key = key if isinstance(key, tuple) else (key,)
                    _add(key, sketch_series(sub["_v"].to_numpy(), delta))
            else:
                _add((), sketch_series(pdf["_v"].to_numpy(), delta))

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # the session's Arrow batches are payload-sized (tiny) —
            # coalesce them to ~64k-row chunks so the groupby/sort/
            # compress cost is paid per chunk, not per wire batch
            buf.append(pdf)
            buf_rows += len(pdf)
            if buf_rows >= _FLUSH_ROWS:
                _flush()
        _flush()
        out = [
            {**dict(zip(groups, key)), **merge_sketch_rows(pd.DataFrame(lst), delta)}
            for key, lst in acc.items()
        ]
        if out:
            yield pd.DataFrame(out)

    parts = proj.mapInPandas(partials, schema=part_schema)

    merged_schema = part_schema

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = merge_sketch_rows(pdf, delta)
        head = {g: pdf[g].iloc[0] for g in groups}
        return pd.DataFrame([{**head, **sk}])

    if groups:
        return parts.groupBy(*groups).applyInPandas(merge_group, merged_schema)
    return parts.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: merge_group(pdf.drop(columns=["_g"], errors="ignore")),
        merged_schema,
    )


def tdigest_profile(
    df: DataFrame,
    cols: Sequence[str],
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Sketch MANY numeric columns in ONE pass over the table: rows
    explode to (column_name, value) pairs JVM-side, then the grouped
    sketch path runs with column_name as the group key — per-batch
    partials for every column ride the same scan, and the merge
    shuffle still carries only sketch rows. Output: (column_name, n,
    vmin, vmax, means, weights) — the t-digest twin of
    stats.profile()'s quantile column."""
    pairs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(c).cast("double").alias("_v"),
        )
        for c in cols
    ]
    long = df.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")
    return tdigest_sketch(long, "_v", group_by=["column_name"], delta=delta)


def cdf_from_sketch(sketch: dict, xs: np.ndarray) -> np.ndarray:
    """Estimated CDF at points xs: inverse of the quantile read-out
    (linear between centroid mid-ranks, anchored at vmin/vmax)."""
    w = np.asarray(sketch["weights"], np.float64)
    m = np.asarray(sketch["means"], np.float64)
    xs = np.asarray(xs, np.float64)
    if len(w) == 0:
        return np.full(len(xs), np.nan)
    total = w.sum()
    mids = np.cumsum(w) - w / 2.0
    grid = np.concatenate([[sketch["vmin"]], m, [sketch["vmax"]]])
    ranks = np.concatenate([[0.0], mids, [total]])
    return np.interp(xs, grid, ranks, left=0.0, right=total) / total


def ks_from_sketches(a: dict, b: dict) -> float:
    """Kolmogorov–Smirnov statistic estimated from two sketches alone:
    sup |F_a − F_b| evaluated on the union of both centroid grids —
    the drift check between two snapshots WITHOUT touching raw data
    (per-snapshot sketches are the only persisted state; the fixed-
    grid alternative lives in operators/drift.py). Estimate error is
    bounded by the digests' rank error (~1e-3 at δ=200)."""
    grid = np.unique(
        np.concatenate(
            [
                [a["vmin"], a["vmax"], b["vmin"], b["vmax"]],
                np.asarray(a["means"], np.float64),
                np.asarray(b["means"], np.float64),
            ]
        )
    )
    return float(np.max(np.abs(cdf_from_sketch(a, grid) - cdf_from_sketch(b, grid))))


def merge_sketch_table(
    sketches: DataFrame,
    group_cols: Sequence[str] = ("column_name",),
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Collapse a table of sketch rows (several per group — e.g. one
    per micro-batch, per snapshot shard, or per partition) into one
    merged sketch per group. Because the merge is associative and
    commutative, the result carries the same rank-error contract as a
    single-pass build — this is what makes a t-digest snapshot
    APPENDABLE: accumulate partial rows cheaply, merge on read."""
    groups = list(group_cols)
    schema = ", ".join(f"{g} string" for g in groups) + ", " + _SKETCH_FIELDS

    def mg(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = merge_sketch_rows(pdf, delta)
        head = {g: pdf[g].iloc[0] for g in groups}
        return pd.DataFrame([{**head, **sk}])

    return sketches.groupBy(*groups).applyInPandas(mg, schema)


def quantile_array_readout(
    sketches: DataFrame,
    probs: Sequence[float],
    key_cols: Sequence[str] = ("column_name",),
) -> DataFrame:
    """(key cols..., quantiles array<double>) from a sketch table —
    the wide-format read-out stats.profile() joins back onto its
    scalar aggregate (sketch rows are tiny, so this stage is free)."""
    keys = list(key_cols)
    schema = ", ".join(f"{k} string" for k in keys) + ", quantiles array<double>"
    probs_l = [float(p) for p in probs]

    def readout(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ests = quantile_from_sketch(
                    {
                        "weights": r["weights"],
                        "means": r["means"],
                        "vmin": r["vmin"],
                        "vmax": r["vmax"],
                    },
                    probs_l,
                )
                rows.append(
                    {**{k: r[k] for k in keys}, "quantiles": ests}
                )
            yield pd.DataFrame(rows)

    return sketches.mapInPandas(readout, schema=schema)


def psi_from_sketches(
    a: dict, b: dict, n_buckets: int = 20, eps: float = 1e-6
) -> float:
    """Population-stability index estimated from two sketches alone:
    bucket masses on a fixed grid spanning both sketches' exact
    [vmin, vmax] come from CDF differences; the formula and eps
    smoothing mirror operators/drift.py (psi = Σ (p_cur − p_base)
    · ln(p_cur / p_base)), so sketch-based and histogram-based
    baselines are directly comparable."""
    lo = min(a["vmin"], b["vmin"])
    hi = max(a["vmax"], b["vmax"])
    if not (hi > lo):
        return 0.0
    edges = np.linspace(lo, hi, n_buckets + 1)
    p_base = np.diff(cdf_from_sketch(a, edges)) + eps
    p_cur = np.diff(cdf_from_sketch(b, edges)) + eps
    return float(np.sum((p_cur - p_base) * np.log(p_cur / p_base)))


def tdigest_quantiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    group_by: Sequence[str] | None = None,
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Long-format quantile estimates: (group cols..., prob, estimate,
    n). Everything downstream of the sketch is Column exprs over the
    tiny merged rows."""
    groups = list(group_by or [])
    sk = tdigest_sketch(df, col, group_by=groups, delta=delta)

    schema = (
        ", ".join(f"{g} string" for g in groups) + ", " if groups else ""
    ) + "prob double, estimate double, n long"
    probs_l = [float(p) for p in probs]

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ests = quantile_from_sketch(
                    {
                        "weights": r["weights"],
                        "means": r["means"],
                        "vmin": r["vmin"],
                        "vmax": r["vmax"],
                    },
                    probs_l,
                )
                for p, e in zip(probs_l, ests):
                    rows.append(
                        {
                            **{g: r[g] for g in groups},
                            "prob": p,
                            "estimate": e,
                            "n": int(r["n"]),
                        }
                    )
            yield pd.DataFrame(rows)

    return sk.mapInPandas(expand, schema=schema)
