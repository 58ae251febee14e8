"""Broadcast Bloom-filter membership for referential checks at scale.

The exact referential operators (operators/referential.py) are
semi/anti equi joins — at 10^12 fact rows that is a full shuffle of
both sides on the key. This module adds the shuffle-free arm: build a
fixed-size bit array over the dim keyset ONCE (partial blooms per
partition, OR-merged through a bounded bucket tree), broadcast it,
and probe the fact side with a vectorized Arrow UDF during its
ordinary scan.

Guarantees (the ones Bloom filters actually make):
  - bloom-miss  ⇒ the key is DEFINITELY absent from dim — a
    guaranteed orphan, found with zero shuffle;
  - bloom-hit   ⇒ present-or-false-positive; fp ≈ (1 − e^(−kn/m))^k
    (fp_rate() computes it for the built filter).

So `bloom_orphan_scan` is the 100-TB integrity monitor: one pass over
fact, no Exchange, catching ≥ (1 − fp) of all violations with zero
false accusations. `bloom_orphans` composes it with an exact
anti-join over only the bloom-hit rows for the exact violation set
(q74 gates it against the plain anti join).

Sizing: bits default 2^23 (1 MiB broadcast) ≈ fp 0.005 at 1M keys /
k=5. The keyset regime is what matters: up to ~10^9 keys a few GiB of
bits broadcast fine; beyond that fall back to the exact join (the
keyset no longer fits any executor-local structure).

Hashing is pandas.util.hash_pandas_object (SipHash with a fixed key)
— deterministic across processes and independent of PYTHONHASHSEED,
so a filter built by one job can be persisted and probed by another.

Reference counterpart: class-membership point reads
(firestore_services.py:187-210) — N+1 lookups there, one broadcast
bit array here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_N_BITS = 1 << 23
DEFAULT_N_HASHES = 5


@dataclass(frozen=True)
class BloomFilter:
    bits: np.ndarray  # uint64 words, little-endian packed
    n_bits: int
    n_hashes: int
    n_keys: int  # rows hashed in (not deduplicated)


def _hash64(s: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(
        s.astype("string").fillna("\x00null"), index=False
    ).to_numpy(np.uint64)


def _bit_positions(h: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(h), n_hashes) bit indices via double hashing: h1 + i·h2
    (Kirsch–Mitzenmacher), arithmetic wrapping mod 2^64 by numpy."""
    with np.errstate(over="ignore"):
        h1 = h % np.uint64(n_bits)
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        i = np.arange(n_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    word = (pos >> np.uint64(6)).ravel()
    mask = np.uint64(1) << (pos & np.uint64(63)).ravel()
    np.bitwise_or.at(bits, word, mask)


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    word = pos >> np.uint64(6)
    shift = pos & np.uint64(63)
    return (((bits[word] >> shift) & np.uint64(1)) == 1).all(axis=1)


def build_bloom(
    df: DataFrame,
    key: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    merge_buckets: int = 64,
) -> BloomFilter:
    """Distributed build: each partition folds ALL its keys into one
    local bit array and emits a single (bucket, bits) row; partial
    blooms OR-merge per bucket (≤ merge_buckets groups, so the driver
    ingests ≤ merge_buckets · n_bits/8 bytes no matter how many input
    partitions there are); the final OR of the bucket rows happens
    driver-side. The shuffle carries only partial-bloom rows — never
    keys."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    proj = df.select(F.col(key).cast("string").alias("_k")).withColumn(
        "_pid", F.spark_partition_id()
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bits // 64, dtype=np.uint64)
        n = 0
        pid = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            _set_bits(bits, _bit_positions(_hash64(pdf["_k"]), n_bits, n_hashes))
            n += len(pdf)
        yield pd.DataFrame(
            [{"bucket": pid % merge_buckets, "bits": bits.tobytes(), "n": n}]
        )

    parts = proj.mapInPandas(partials, schema="bucket int, bits binary, n long")

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_bits // 64, dtype=np.uint64)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pd.DataFrame(
            [{"bits": acc.tobytes(), "n": int(pdf["n"].sum())}]
        )

    rows = (
        parts.groupBy("bucket")
        .applyInPandas(or_merge, schema="bits binary, n long")
        .collect()
    )
    acc = np.zeros(n_bits // 64, dtype=np.uint64)
    n_keys = 0
    for r in rows:
        acc |= np.frombuffer(r.bits, dtype=np.uint64)
        n_keys += r.n
    return BloomFilter(bits=acc, n_bits=n_bits, n_hashes=n_hashes, n_keys=n_keys)


def fp_rate(bf: BloomFilter, n_distinct: int | None = None) -> float:
    """Theoretical false-positive probability (1 − e^(−kn/m))^k; pass
    the true distinct-key count if known (n_keys counts duplicates)."""
    n = bf.n_keys if n_distinct is None else n_distinct
    return (1.0 - math.exp(-bf.n_hashes * n / bf.n_bits)) ** bf.n_hashes


def bloom_hit_col(df: DataFrame, bf: BloomFilter, key: str) -> Column:
    """Vectorized membership probe as a Column — rides the fact scan.
    The bit array ships to executors via a Spark broadcast (one copy
    per executor, not per task)."""
    sc = df.sparkSession.sparkContext
    bcast = sc.broadcast(bf.bits.tobytes())
    n_bits, n_hashes = bf.n_bits, bf.n_hashes

    @pandas_udf("boolean")
    def probe(s: pd.Series) -> pd.Series:
        bits = np.frombuffer(bcast.value, dtype=np.uint64)
        if len(s) == 0:
            return pd.Series([], dtype=bool)
        hits = _test_bits(bits, _bit_positions(_hash64(s), n_bits, n_hashes))
        return pd.Series(hits)

    return probe(F.col(key).cast("string"))


def bloom_orphan_scan(
    fact: DataFrame, bf: BloomFilter, key: str
) -> DataFrame:
    """GUARANTEED orphans in one shuffle-free pass: rows whose key the
    dim bloom rejects are definitely absent from dim. Misses only the
    fp-fraction of true orphans (they pass the bloom); accuses no
    valid row. The daily-monitor mode for 10^12-row fact tables."""
    return fact.filter(~bloom_hit_col(fact, bf, key))


def bloom_orphans(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """EXACT orphan set via the bloom fast path: bloom-miss rows are
    orphans outright (no shuffle); only bloom-HIT rows enter the
    anti join. When violations dominate (a bad upstream delete), the
    join input collapses to the valid fraction; when the table is
    clean it degrades to the plain anti join plus one broadcast probe.
    Persist `fact` upstream if scanning it twice matters more than the
    shuffle saved."""
    bf = build_bloom(dim, key, n_bits, n_hashes)
    flagged = fact.withColumn("_bloom_hit", bloom_hit_col(fact, bf, key))
    definite = flagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit")
    candidates = flagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    fp_orphans = candidates.join(
        dim.select(key).dropDuplicates([key]), key, "left_anti"
    )
    return definite.unionByName(fp_orphans)
