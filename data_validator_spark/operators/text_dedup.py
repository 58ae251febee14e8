"""Document deduplication at training-pipeline scale.

Four tiers, cheapest first:
  exact        md5-groupBy (one shuffle)
  ngram        word-shingle Jaccard over an inverted index self-join
  minhash_lsh  MinHash signatures + banded LSH bucket join (the scale
               path: candidate generation touches only colliding docs)
  simhash      64-bit SimHash + hamming-ball banding

MinHash/SimHash signatures use deterministic xxhash64 streams (no
Python, no rand()); at 100 TB the LSH band join is the only shuffle
whose width is controlled by (n_hashes, bands) rather than O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_validator_spark.operators.text import fingerprint, normalized_text, word_ngrams


# ------------------------------------------------------------------ exact


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(fingerprint, keep_id, dup_id) rows for exact duplicates; the
    lexicographically-smallest id per group is the keeper."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    ranked = fp.withColumn("keep_id", F.first(id_col).over(w)).withColumn(
        "rn", F.row_number().over(w)
    )
    return ranked.filter(F.col("rn") > 1).select(
        F.col("fp").alias("fingerprint"),
        "keep_id",
        F.col(id_col).alias("dup_id"),
    )


# ------------------------------------------------------------------ n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via PREFIX-FILTERED self-join
    (AllPairs/PPJoin family) — same answers as the naive inverted-index
    join, a fraction of its candidate pairs:

      1. global rare-first token order (by document frequency, then
         token) — the AllPairs lemma: if |A∩B| >= a, the first
         |A|-a+1 / |B|-a+1 tokens of A and B under ANY shared total
         order must intersect; J >= t implies a >= ceil(t*max(|A|,|B|)),
         so prefixes of length |x| - ceil(t*|x|) + 1 are sound.
      2. candidates = prefix-token inverted-index join + size filter
         (t*|A| <= |B| <= |A|/t).
      3. exact verification on the full gram arrays
         (array_intersect), so the threshold is exact, not estimated.

    Output (id_a, id_b, jaccard) with id_a < id_b. The only wide
    shuffle is the prefix join, whose key is the RAREST tokens —
    bucket sizes shrink exactly where the naive join's explode (every
    stopword shingle) blows up.
    """
    t = float(threshold)
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("_grams"),
    ).filter(F.size("_grams") > 0)
    ex = grams.select("_id", F.size("_grams").alias("_sz"), F.explode("_grams").alias("_g"))
    dfreq = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    ranked = ex.join(dfreq, "_g")
    w = Window.partitionBy("_id").orderBy("_df", "_g")
    # round before ceil: 0.8*100 floats to 80.0000...01 -> ceil 81
    prefix_len = F.col("_sz") - F.ceil(F.round(F.lit(t) * F.col("_sz"), 9)) + 1
    prefix = ranked.withColumn("_pos", F.row_number().over(w)).filter(
        F.col("_pos") <= prefix_len
    )
    a = prefix.select(F.col("_id").alias("id_a"), F.col("_sz").alias("sz_a"), "_g")
    b = prefix.select(F.col("_id").alias("id_b"), F.col("_sz").alias("sz_b"), "_g")
    cand = (
        a.join(b, "_g")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.greatest("sz_a", "sz_b") * t
                <= F.least("sz_a", "sz_b") + F.lit(1e-9)
            )
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = grams.select(F.col("_id").alias("id_a"), F.col("_grams").alias("_ga"))
    gb = grams.select(F.col("_id").alias("id_b"), F.col("_grams").alias("_gb"))
    verified = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("_ga", "_gb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("_ga") + F.size("_gb") - F.col("inter")),
                6,
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ------------------------------------------------------------------ MinHash + LSH


def minhash_signature(grams: Column, n_hashes: int = 64) -> Column:
    """Array of n_hashes minimum hash values over the shingle set.
    Hash stream i = xxhash64(shingle, i) — deterministic, JVM-side."""
    return F.array(
        *[
            F.array_min(F.transform(grams, lambda g: F.xxhash64(g, F.lit(i))))
            for i in range(n_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """LSH candidate pairs (id_a, id_b, est_jaccard).

    Signature matrix banded into `bands` rows of n_hashes/bands; docs
    colliding in ANY band become candidates (bucket join on the band
    hash — the only shuffle key, so skewed buckets can be salted).
    est_jaccard = fraction of matching signature positions.
    """
    rows_per_band = n_hashes // bands
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("_grams"),
    ).filter(F.size("_grams") > 0)
    sig = grams.select("_id", minhash_signature(F.col("_grams"), n_hashes).alias("_sig"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at("_sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("_id", "_sig", F.explode(band_structs).alias("bb")).select(
        "_id", "_sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.withColumn(
        "est_jaccard",
        F.round(
            F.size(
                F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
            )
            / F.lit(float(n_hashes)),
            6,
        ),
    )
    return cand.select("id_a", "id_b", "est_jaccard")


# ------------------------------------------------------------------ SimHash


def simhash64(grams: Column) -> Column:
    """64-bit SimHash of a shingle/token array: per-bit weighted vote
    of xxhash64 token bits, fully as Column expressions."""
    hashed = F.transform(grams, lambda g: F.xxhash64(g))
    out = F.lit(0).cast("long")
    for bit in range(64):
        vote = F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        # set bit via shiftleft (two's-complement safe for bit 63)
        out = out.bitwiseOR(
            F.shiftleft(F.when(vote > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), bit)
        )
    return out


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup candidates by SimHash banding: split the 64-bit hash
    into n_bands chunks; by pigeonhole, pairs within hamming distance
    < n_bands share at least one exact chunk. Verify with popcount.

    Output (id_a, id_b, hamming <= max_hamming).
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    sh = df.select(F.col(id_col).alias("_id"), simhash64(toks).alias("_sh"))
    chunk_bits = 64 // n_bands
    mask = (1 << chunk_bits) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned("_sh", i * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for i in range(n_bands)
        ]
    )
    banded = sh.select("_id", "_sh", F.explode(chunks).alias("c")).select(
        "_id", "_sh", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk")
    )
    a = banded.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "band", "chunk")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "band", "chunk")
    cand = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
