"""Misra–Gries heavy-hitters tests (operators/heavy_hitters.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators import heavy_hitters as hh


def zipfish(spark, n=60_000, parts=8):
    """60% of rows on 6 hot keys, the rest unique — string items."""
    hot = F.concat(F.lit("hot"), (F.col("id") % 6).cast("string"))
    cold = F.concat(F.lit("cold"), F.col("id").cast("string"))
    return spark.range(0, n, numPartitions=parts).select(
        F.when(F.col("id") % 10 < 6, hot).otherwise(cold).alias("item"),
        (F.col("id") % 2).cast("string").alias("side"),
    )


def exact_counts(n=60_000):
    ids = np.arange(n)
    hot_mask = ids % 10 < 6
    out = {}
    for h in range(6):
        out[f"hot{h}"] = int(np.sum(hot_mask & (ids % 6 == h)))
    return out, n


class TestGuarantees:
    def test_heavy_items_present_with_bounded_error(self, spark):
        df = zipfish(spark)
        got = {r.item: r for r in hh.heavy_hitters(df, "item", k=20).collect()}
        exact, n = exact_counts()
        bound = n // 21
        assert len(got) <= 20
        any_row = next(iter(got.values()))
        assert any_row.n == n and any_row.err_bound == bound
        for item, true_cnt in exact.items():
            if true_cnt > bound:
                assert item in got, f"heavy item {item} missing"
                est = got[item].est_count
                assert est <= true_cnt
                assert true_cnt - est <= bound
        # no item is over-reported, including cold survivors
        for item, r in got.items():
            true_cnt = exact.get(item, 1)
            assert r.est_count <= true_cnt

    def test_grouped_and_layout_independent(self, spark):
        df = zipfish(spark)
        a = hh.heavy_hitters(df, "item", k=10, group_by=["side"])
        rows = a.collect()
        sides = {r.side for r in rows}
        assert sides == {"0", "1"}
        per_side = {s: [r for r in rows if r.side == s] for s in sides}
        for s, rs in per_side.items():
            assert len(rs) <= 10
            assert all(r.n == 30_000 for r in rs)
            # id % 6 == h pins parity (step 6 is even), so each side
            # owns exactly 3 hot keys — all heavy at k=10 (~20% each)
            items = {r.item for r in rs}
            assert sum(i.startswith("hot") for i in items) == 3

    def test_exact_when_under_k(self, spark):
        df = spark.range(0, 1000, numPartitions=4).select(
            (F.col("id") % 7).cast("string").alias("item")
        )
        got = {r.item: r.est_count for r in hh.heavy_hitters(df, "item", k=50).collect()}
        assert len(got) == 7
        # fewer distinct items than k at every stage -> counts exact
        for i in range(7):
            assert got[str(i)] == len([x for x in range(1000) if x % 7 == i])

    def test_nulls_excluded_from_n(self, spark):
        df = spark.range(0, 1000, numPartitions=2).select(
            F.when(F.col("id") % 4 == 0, None)
            .otherwise((F.col("id") % 3).cast("string"))
            .alias("item")
        )
        rows = hh.heavy_hitters(df, "item", k=10).collect()
        assert rows[0].n == 750
        assert sum(r.est_count for r in rows) == 750
