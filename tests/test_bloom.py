"""Broadcast Bloom-filter membership tests (operators/bloom.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators import bloom, referential


N_BITS = 1 << 17  # 16 KiB — sized for the 10k-key test dims


@pytest.fixture(scope="module")
def dim(spark):
    # keys 0..9999 as strings, spread over partitions
    return (
        spark.range(0, 10_000, numPartitions=8)
        .select(F.concat(F.lit("k"), F.col("id")).alias("key"))
        .cache()
    )


@pytest.fixture(scope="module")
def fact(spark):
    # keys 0..19999: half members, half orphans
    return (
        spark.range(0, 20_000, numPartitions=8)
        .select(
            F.col("id"),
            F.concat(F.lit("k"), F.col("id")).alias("key"),
        )
        .cache()
    )


class TestBuild:
    def test_deterministic_and_merge_independent(self, spark, dim):
        a = bloom.build_bloom(dim, "key", n_bits=N_BITS)
        b = bloom.build_bloom(dim.repartition(3), "key", n_bits=N_BITS)
        assert a.n_keys == b.n_keys == 10_000
        assert np.array_equal(a.bits, b.bits)  # OR-merge is layout-free

    def test_rejects_unaligned_bits(self, dim):
        with pytest.raises(ValueError):
            bloom.build_bloom(dim, "key", n_bits=100)


class TestProbe:
    def test_zero_false_negatives_and_bounded_fp(self, spark, dim, fact):
        bf = bloom.build_bloom(dim, "key", n_bits=N_BITS)
        probed = fact.withColumn(
            "hit", bloom.bloom_hit_col(fact, bf, "key")
        ).collect()
        members = [r for r in probed if r.id < 10_000]
        outsiders = [r for r in probed if r.id >= 10_000]
        assert all(r.hit for r in members)  # the Bloom guarantee
        fp = sum(r.hit for r in outsiders) / len(outsiders)
        theory = bloom.fp_rate(bf, n_distinct=10_000)
        assert fp <= max(5 * theory, 0.02)

    def test_orphan_scan_shuffle_free_and_sound(self, spark, dim, fact):
        bf = bloom.build_bloom(dim, "key", n_bits=N_BITS)
        scan = bloom.bloom_orphan_scan(fact, bf, "key")
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # one pass, zero shuffle
        got = {r.id for r in scan.collect()}
        assert got <= set(range(10_000, 20_000))  # no false accusations
        assert len(got) >= 0.98 * 10_000  # >= (1 - fp) of true orphans


class TestExactComposition:
    def test_bloom_orphans_equals_plain_anti_join(self, spark, dim, fact):
        via_bloom = sorted(
            r.id for r in bloom.bloom_orphans(fact, dim, "key", n_bits=N_BITS).collect()
        )
        exact = sorted(
            r.id for r in referential.orphans(fact, dim, "key").collect()
        )
        assert via_bloom == exact == list(range(10_000, 20_000))

    def test_null_keys_are_orphans_both_paths(self, spark, dim):
        f = spark.range(0, 100, numPartitions=2).select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, None)
            .otherwise(F.concat(F.lit("k"), F.col("id")))
            .alias("key"),
        )
        via_bloom = {r.id for r in bloom.bloom_orphans(f, dim, "key", n_bits=N_BITS).collect()}
        exact = {r.id for r in referential.orphans(f, dim, "key").collect()}
        assert via_bloom == exact == {i for i in range(100) if i % 10 == 0}
