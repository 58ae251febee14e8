"""Mergeable t-digest quantile sketch (operators/tdigest.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators import tdigest as td


class TestKernel:
    def test_rank_error_bound_across_distributions(self):
        rng = np.random.default_rng(0)
        for data in (
            rng.random(200_000),
            rng.lognormal(0, 2, 200_000),
            np.concatenate(
                [rng.normal(0, 1, 100_000), rng.normal(100, 1, 100_000)]
            ),
        ):
            parts = np.array_split(data, 37)
            merged = td.merge_sketch_rows(
                pd.DataFrame([td.sketch_series(p) for p in parts])
            )
            assert merged["n"] == len(data)
            assert sum(merged["weights"]) == pytest.approx(len(data))
            assert len(merged["means"]) <= 100  # delta/2
            probs = [0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999]
            s = np.sort(data)
            for p, e in zip(probs, td.quantile_from_sketch(merged, probs)):
                rank = np.searchsorted(s, e) / len(s)
                assert abs(rank - p) < 0.005, (p, rank)

    def test_merge_is_associative_enough(self):
        # two-level merge vs flat merge: both inside the rank contract
        rng = np.random.default_rng(7)
        data = rng.lognormal(0, 2, 90_000)
        parts = np.array_split(data, 30)
        rows = pd.DataFrame([td.sketch_series(p) for p in parts])
        two = td.merge_sketch_rows(
            pd.DataFrame(
                [
                    td.merge_sketch_rows(rows.iloc[:10]),
                    td.merge_sketch_rows(rows.iloc[10:20]),
                    td.merge_sketch_rows(rows.iloc[20:]),
                ]
            )
        )
        s = np.sort(data)
        for p, e in zip([0.01, 0.5, 0.99], td.quantile_from_sketch(two, [0.01, 0.5, 0.99])):
            assert abs(np.searchsorted(s, e) / len(s) - p) < 0.01

    def test_edges(self):
        empty = td.sketch_series(np.array([]))
        assert empty["n"] == 0
        assert td.quantile_from_sketch(empty, [0.5]) == [None]
        one = td.sketch_series(np.array([42.0]))
        assert td.quantile_from_sketch(one, [0.0, 0.5, 1.0]) == [42.0] * 3
        const = td.sketch_series(np.full(10_000, 3.25))
        assert td.quantile_from_sketch(const, [0.01, 0.99]) == [3.25, 3.25]
        with_nan = td.sketch_series(np.array([1.0, np.nan, 2.0]))
        assert with_nan["n"] == 2

    def test_deterministic(self):
        rng = np.random.default_rng(3)
        data = rng.normal(size=50_000)
        a = td.sketch_series(data)
        b = td.sketch_series(data.copy())
        assert a == b


class TestDriftFromSketches:
    def test_ks_between_sketches_tracks_exact_ks(self):
        rng = np.random.default_rng(11)
        a = rng.normal(0.0, 1.0, 120_000)
        b = rng.normal(0.35, 1.0, 120_000)  # exact KS ~ 0.139
        sa, sb = td.sketch_series(a), td.sketch_series(b)
        est = td.ks_from_sketches(sa, sb)
        # exact two-sample KS
        allv = np.sort(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
        exact = float(np.max(np.abs(fa - fb)))
        assert est == pytest.approx(exact, abs=0.005)
        # identical snapshots -> ~0
        assert td.ks_from_sketches(sa, sa) == pytest.approx(0.0, abs=1e-9)

    def test_cdf_matches_quantile_inverse(self):
        rng = np.random.default_rng(5)
        s = td.sketch_series(rng.lognormal(0, 1, 50_000))
        qs = td.quantile_from_sketch(s, [0.1, 0.5, 0.9])
        back = td.cdf_from_sketch(s, np.asarray(qs))
        assert np.allclose(back, [0.1, 0.5, 0.9], atol=1e-6)


class TestSparkStage:
    def test_global_sketch_and_quantiles(self, spark):
        n = 60_000
        df = spark.range(0, n, numPartitions=8).select(
            (F.hash(F.col("id").cast("string")) % 10_000).cast("double").alias("x")
        )
        sk = td.tdigest_sketch(df, "x").collect()
        assert len(sk) == 1
        row = sk[0]
        assert row.n == n
        assert sum(row.weights) == pytest.approx(n)
        assert len(row.means) <= 100
        # estimates within the rank contract vs exact percentile
        q = td.tdigest_quantiles(df, "x", [0.01, 0.5, 0.99]).collect()
        exact = df.agg(
            F.percentile("x", [0.0, 0.008, 0.012, 0.49, 0.51, 0.988, 0.992, 1.0])
        ).first()[0]
        lo = {0.01: exact[1], 0.5: exact[3], 0.99: exact[5]}
        hi = {0.01: exact[2], 0.5: exact[4], 0.99: exact[6]}
        for r in q:
            assert r.n == n
            assert lo[r.prob] <= r.estimate <= hi[r.prob], r

    def test_grouped_quantiles(self, spark):
        df = spark.range(0, 30_000, numPartitions=6).select(
            (F.col("id") % 3).cast("string").alias("g"),
            # per-group shifted uniform: group k spans [1000k, 1000k+1000)
            ((F.col("id") % 3) * 1000 + F.abs(F.hash("id")) % 1000)
            .cast("double")
            .alias("x"),
        )
        out = td.tdigest_quantiles(df, "x", [0.5], group_by=["g"]).collect()
        assert len(out) == 3
        for r in out:
            assert r.estimate == pytest.approx(int(r.g) * 1000 + 500, abs=25)

    def test_profile_many_columns_one_pass(self, spark):
        df = spark.range(0, 20_000, numPartitions=4).select(
            F.col("id").cast("double").alias("a"),
            (F.col("id") % 100).cast("double").alias("b"),
        )
        prof = td.tdigest_profile(df, ["a", "b"])
        rows = {r.column_name: r for r in prof.collect()}
        assert set(rows) == {"a", "b"}
        assert rows["a"].n == 20_000 and rows["b"].n == 20_000
        med_a = td.quantile_from_sketch(rows["a"].asDict(), [0.5])[0]
        med_b = td.quantile_from_sketch(rows["b"].asDict(), [0.5])[0]
        assert med_a == pytest.approx(10_000, rel=0.01)
        assert med_b == pytest.approx(49.5, abs=2.0)
        # one scan: exactly one parquet-free range source, single stage
        # pair (map partials -> grouped merge)
        plan = prof._jdf.queryExecution().executedPlan().toString()
        # after collect() AQE prints Final + Initial sections; audit the
        # final one only
        final = plan.split("== Initial Plan ==")[0].lower()
        assert final.count("range (0, 20000") == 1
        assert final.count("mapinpandas") == 1

    def test_sketch_shuffle_carries_sketches_not_values(self, spark):
        df = spark.range(0, 20_000, numPartitions=4).select(
            F.col("id").cast("double").alias("x")
        )
        sk = td.tdigest_sketch(df, "x")
        plan = sk._jdf.queryExecution().executedPlan().toString()
        # the merge shuffle sits ABOVE the map-side partial stage:
        # the exchange's child must be the partial mapInPandas output
        assert "MapInPandas" in plan
        # determinism: same input -> byte-identical sketch
        a, b = sk.collect()[0], td.tdigest_sketch(df, "x").collect()[0]
        assert a.means == b.means and a.weights == b.weights
