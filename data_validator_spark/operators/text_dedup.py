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

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_validator_spark.operators.skew import salted_self_join
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


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(_id, _grams) distinct word-shingle arrays — the normalization +
    shingling pass is the dominant CPU of every text-dedup tier, so
    compute it ONCE, persist, and pass the result to
    ngram_jaccard_pairs / minhash_signatures / minhash_lsh_candidates
    via their `shingled=` parameter when running more than one tier
    over the same corpus (at production scale this table is written
    out and shared, like the signature table)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("_grams"),
    ).filter(F.size("_grams") > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    shingled: DataFrame | None = None,
    persist_shingles: bool = True,
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

    The shingle table feeds three plan branches (inverted index + the
    two verification sides); it is persisted by default so the
    shingling pass runs once — or pass a pre-persisted `shingled`
    (from shingles()) shared with the minhash tier.
    """
    t = float(threshold)
    if shingled is not None:
        grams = shingled
    else:
        grams = shingles(df, id_col, text_col, n)
        if persist_shingles:
            grams = grams.persist()
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


_LONG_MAX = (1 << 63) - 1


def minhash_signature(grams: Column, n_hashes: int = 64) -> Column:
    """Array of n_hashes minimum hash values over the shingle set.
    Hash stream i = xxhash64(shingle, i) — deterministic, JVM-side.

    Single `aggregate` pass over the shingle array accumulating all
    n_hashes minima at once (the seed array is a constant-folded
    literal). The earlier form — n_hashes separate
    array_min(transform(...)) passes — walked the shingle array
    n_hashes times per row and fell out of codegen on wide configs.
    Values are identical (same per-element xxhash64(gram, seed_int)
    stream); empty arrays yield LONG_MAX fills, but every caller
    filters size(grams) > 0 first.
    """
    seeds = F.array(*[F.lit(i) for i in range(n_hashes)])
    init = F.array_repeat(F.lit(_LONG_MAX).cast("long"), n_hashes)
    return F.aggregate(
        grams,
        init,
        lambda acc, g: F.zip_with(
            acc,
            F.transform(seeds, lambda s: F.xxhash64(g, s)),
            lambda a, h: F.least(a, h),
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 64,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(_id, _sig) signature table — the reusable/persistable artifact
    (at production scale this is written once and shared by dedup and
    retrieval; minhash_lsh_candidates persists it for the duration of
    one candidate computation). Pass `shingled` (from shingles()) to
    reuse an already-computed shingle table."""
    grams = (
        shingled
        if shingled is not None
        else shingles(df, id_col, text_col, n)
    )
    return grams.select(
        "_id", minhash_signature(F.col("_grams"), n_hashes).alias("_sig")
    )


def _band_signature(sig: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(_id, band, bucket) band-bucket rows from a (_id, _sig)
    signature table — shared by the self-join LSH path and the
    incremental state-join path (buckets must be identical across
    batches, so this is the single definition)."""
    rows_per_band = n_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at("_sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("_id", F.explode(band_structs).alias("bb")).select(
        "_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    bucket_cap: int = 4096,
    persist_signatures: bool = True,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs (id_a, id_b, est_jaccard).

    Signature matrix banded into `bands` rows of n_hashes/bands; docs
    colliding in ANY band become candidates. Shuffle discipline (the
    part that matters at 100 TB):

      - the band-bucket join carries ONLY (id, band, bucket) — the
        64-long signature arrays never ride the widest shuffle;
      - hot buckets (boilerplate/near-identical clusters are Zipf-
        skewed) are chunk-split by skew.salted_self_join so no join
        task exceeds ~bucket_cap rows per side;
      - the pair-dedup shuffle carries only (id_a, id_b); signatures
        are re-joined onto the (small) deduped pair set to compute
        est_jaccard = fraction of matching signature positions.

    The signature table feeds three plan branches (banding + the two
    pair-side joins); persist_signatures=True (default) persists it so
    shingling+hashing runs once, not three times. It is unpersisted
    when the session drops it (LRU) — or materialize it yourself via
    minhash_signatures() and manage its lifecycle.
    """
    sig = minhash_signatures(df, id_col, text_col, n, n_hashes, shingled=shingled)
    if persist_signatures:
        sig = sig.persist()
    banded = _band_signature(sig, n_hashes, bands)
    pairs = (
        salted_self_join(banded, "_id", ["band", "bucket"], cap=bucket_cap)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"))
    sb = sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"))
    cand = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
                    )
                )
                / F.lit(float(n_hashes)),
                6,
            ),
        )
    )
    return cand.select("id_a", "id_b", "est_jaccard")


# ------------------------------------------------------------------ SimHash


# bit masks 2^0..2^62 plus the sign bit as a two's-complement long
_BIT_MASKS = [1 << b for b in range(63)] + [-(1 << 63)]


def simhash64(grams: Column) -> Column:
    """64-bit SimHash of a shingle/token array: per-bit weighted vote
    of xxhash64 token bits, fully as Column expressions.

    ONE aggregate pass over the token-hash array accumulating a
    64-element vote vector ((h & mask_j) != 0 -> +1 else -1 per bit),
    then one fold packing votes back into a long. The earlier form ran
    64 separate `aggregate` passes (one per bit) — 64x the array
    walks. Output is bit-identical: (h & 2^j) != 0 <=> (h >> j) & 1,
    including bit 63 via the negative-long sign mask.
    """
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    hashed = F.transform(grams, lambda g: F.xxhash64(g))
    votes = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc.bitwiseOR(m),
    )


# ------------------------------------------------------------------ pipeline


@dataclass
class DedupResult:
    """Outputs of dedup_pipeline. `keepers` is the actionable table:
    every input id with its duplicate-component and a keep/drop flag
    (singletons keep themselves)."""

    exact_pairs: DataFrame      # (fingerprint, keep_id, dup_id)
    candidate_pairs: DataFrame  # (id_a, id_b, est_jaccard) among reps
    verified_pairs: DataFrame   # (id_a, id_b, jaccard) exact >= threshold
    clusters: DataFrame         # (component, member_id, is_keeper), multi-member
    keepers: DataFrame          # (id, component, is_keeper) for ALL ids
    _persisted: list = field(default_factory=list)
    # the persisted (_id, _grams) shingle table over the exact-tier
    # representatives — exposed so incremental_dedup_pipeline can
    # derive keeper signatures without re-shingling the batch
    shingles: DataFrame | None = None

    def unpersist(self) -> None:
        for df in self._persisted:
            df.unpersist()


def dedup_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.8,
    bucket_cap: int = 4096,
    est_margin: float = 0.15,
    algorithm: str = "star",
) -> DedupResult:
    """End-to-end dedup action: exact -> minhash-LSH candidates ->
    EXACT-jaccard verify -> connected-component clusters -> keeper
    list, in one composition (previously this lived only in
    tools/dedup_bench.py).

    Tier order is the scale decision:
      1. exact fingerprint pass FIRST; only one representative per
         byte-identical group (plus all uniques) enters the expensive
         tiers — boilerplate-heavy corpora shrink 2-10x before any
         shingling happens;
      2. one persisted shingle pass over the representatives feeds
         BOTH the minhash banding and the verification joins;
      3. LSH candidates pre-filtered at est_jaccard >= threshold -
         est_margin (signature noise is CORRELATED per doc — one
         unlucky signature lowers every estimate of that doc — so the
         margin covers the per-doc tail), then verified with EXACT
         jaccard on the gram arrays: the final keeper set depends only
         on true jaccard, never on hash luck (the banding miss
         probability at the default r=2 x 32 bands is (1-J^2)^32 ~
         6e-15 at J=0.8);
      4. edges = exact pairs + verified near-dup pairs -> O(log n)
         star-contraction components -> min-id keeper per component.

    Returns DedupResult; call .unpersist() when done with the outputs.
    """
    docs = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .filter(F.col("_text").isNotNull())
    )
    # tier 1: exact duplicates; representatives move on
    fp = docs.select("_id", fingerprint(F.col("_text")).alias("fp"))
    w = Window.partitionBy("fp").orderBy(F.col("_id").asc())
    ranked = fp.withColumn("keep_id", F.first("_id").over(w)).withColumn(
        "_rn", F.row_number().over(w)
    )
    exact_pairs = ranked.filter(F.col("_rn") > 1).select(
        F.col("fp").alias("fingerprint"), "keep_id", F.col("_id").alias("dup_id")
    )
    reps = docs.join(
        ranked.filter(F.col("_rn") == 1).select("_id"), "_id", "left_semi"
    )
    # tier 2: one shingle pass shared by banding + verification
    sh = shingles(reps, "_id", "_text", n).persist()
    cand = minhash_lsh_candidates(
        reps, "_id", "_text", n, n_hashes, bands, bucket_cap,
        persist_signatures=True, shingled=sh,
    ).filter(F.col("est_jaccard") >= threshold - est_margin)
    # tier 3: exact verification on the (small) candidate set
    ga = sh.select(F.col("_id").alias("id_a"), F.col("_grams").alias("_ga"))
    gb = sh.select(F.col("_id").alias("id_b"), F.col("_grams").alias("_gb"))
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
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # tier 4: transitive closure over both edge families
    from data_validator_spark.operators.graph import dedup_clusters

    edges = exact_pairs.select(
        F.col("keep_id").alias("id_a"), F.col("dup_id").alias("id_b")
    ).unionByName(verified.select("id_a", "id_b"))
    clusters = dedup_clusters(edges, algorithm=algorithm)
    keepers = (
        docs.select("_id")
        .join(clusters, docs["_id"] == clusters["member_id"], "left")
        .select(
            F.col("_id").alias("id"),
            F.coalesce("component", F.col("_id")).alias("component"),
            F.coalesce("is_keeper", F.lit(True)).alias("is_keeper"),
        )
    )
    return DedupResult(
        exact_pairs=exact_pairs,
        candidate_pairs=cand,
        verified_pairs=verified,
        clusters=clusters,
        keepers=keepers,
        _persisted=[sh],
        shingles=sh,
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    bucket_cap: int = 4096,
) -> DataFrame:
    """Near-dup candidates by SimHash banding: split the 64-bit hash
    into n_bands chunks; by pigeonhole, pairs within hamming distance
    < n_bands share at least one exact chunk. Verify with popcount.

    The simhash itself (one long) rides the band join as a payload
    column — unlike minhash's 64-long arrays it's scalar-sized, so
    in-join verification is cheaper than a re-join. Hot chunks
    (duplicate-heavy corpora collapse to few simhashes) are split by
    skew.salted_self_join; hamming is computed BEFORE the pair-dedup
    shuffle so dedup carries only (id_a, id_b, hamming).

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
    cand = salted_self_join(
        banded, "_id", ["band", "chunk"], cap=bucket_cap, payload_cols=["_sh"]
    )
    ham = F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def winnow_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Candidate near-duplicate pairs from MOSS winnowing fingerprints
    (text.winnow_fingerprints): -> (id_a, id_b, n_shared) for pairs
    sharing >= min_shared selected fingerprints, id_a < id_b.

    The third candidate generator next to minhash-LSH and simhash
    banding — winnowing's guarantee is positional (any shared run of
    >= n+window-1 words produces a shared fingerprint), which catches
    contiguous plagiarism/boilerplate that permutation-based minhash
    treats as low jaccard. Scale discipline mirrors the LSH path:
    fingerprints appearing in more than max_doc_freq documents are
    dropped BEFORE the self-join (boilerplate n-grams are the hot
    keys here; the cap bounds any bucket's pair fan-out at
    max_doc_freq^2), and only (fingerprint, id) pairs ever shuffle.
    """
    from data_validator_spark.operators.text import winnow_fingerprints

    fps = df.select(
        F.col(id_col).alias("_id"),
        F.explode(winnow_fingerprints(F.col(text_col), n, window)).alias("_h"),
    )
    freq = fps.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    cold = fps.join(
        freq.filter(F.col("_df") <= max_doc_freq).select("_h"), "_h"
    )
    a = cold.select(F.col("_h"), F.col("_id").alias("id_a"))
    b = cold.select(F.col("_h"), F.col("_id").alias("id_b"))
    pairs = a.join(b, "_h").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ------------------------------------------------------------------ ExactSubstr


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    keep_first: bool = True,
) -> DataFrame:
    """Substring-level exact deduplication (the ExactSubstr modality of
    Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): find every maximal token span of >= k tokens that
    appears verbatim more than once in the corpus and emit per-document
    CUT-LISTS -> (doc_id, span_start, span_end, span_tokens), token
    positions 0-based, span_end exclusive.

    The paper builds a corpus-wide suffix array — inherently
    single-machine. The distributed reformulation: a span of >= k
    tokens is repeated iff every one of its overlapping token k-grams
    is repeated, so
      1. tokenize (whitespace, lowercased — text.normalized_text);
      2. emit every overlapping k-gram WITH its position (posexplode);
         the k-gram string exists only inside the scan-fused
         projection — what shuffles is md5(gram) + (id, pos), never
         the text;
      3. one groupBy(md5) aggregate -> occurrence count + global-first
         occurrence (min struct). Hot boilerplate grams are handled by
         map-side partial aggregation — this formulation never builds
         candidate PAIRS, so there is no doc-frequency blow-up to cap
         (contrast winnow_candidates' max_doc_freq);
      4. join the tiny verdict back on the hash and keep duplicated
         positions (keep_first exempts the corpus-wide first
         occurrence per gram, so one copy of every passage survives —
         the paper's "leave one" policy);
      5. merge per-doc positions into maximal runs: spans [p, p+k)
         for kept positions p, q overlap/touch iff q - p <= k, so a
         gap > k starts a new run (one window pass) — the exact
         union of the duplicated-span intervals.

    At 10^12 rows every stage is a map or one hash shuffle keyed by
    128-bit gram hash / doc id; nothing is O(pairs) and no suffix
    array ever materializes.
    """
    from data_validator_spark.operators.text import word_ngrams

    grams = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("_pos", "_g"),
    ).select("_id", "_pos", F.md5("_g").alias("_h"))
    agg = grams.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(F.struct("_id", "_pos")).alias("_first"),
    )
    marked = grams.join(agg.filter(F.col("_cnt") >= 2), "_h")
    if keep_first:
        marked = marked.filter(
            ~(
                (F.col("_first._id") == F.col("_id"))
                & (F.col("_first._pos") == F.col("_pos"))
            )
        )
    w = Window.partitionBy("_id").orderBy("_pos")
    runs = (
        marked.select("_id", "_pos")
        .withColumn(
            "_brk",
            F.when(
                F.col("_pos") - F.lag("_pos").over(w) > k, F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_run",
            F.sum("_brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        runs.groupBy(F.col("_id").alias(id_col), "_run")
        .agg(
            F.min("_pos").cast("long").alias("span_start"),
            (F.max("_pos") + k).cast("long").alias("span_end"),
            (F.max("_pos") + k - F.min("_pos")).cast("long").alias(
                "span_tokens"
            ),
        )
        .drop("_run")
    )


# ------------------------------------------------------------------ incremental


@dataclass
class IncrementalDedupResult:
    """Outputs of incremental_dedup_pipeline. `assignments` is the
    actionable table: every batch id with its final keeper and how it
    resolved — 'exact_state' (fingerprint matched the persisted
    corpus), 'near_state' (its within-batch component keeper matched a
    persisted keeper by signature similarity), 'batch_dup' (duplicate
    of another doc in this batch), or 'new' (a genuinely new keeper,
    appended to state)."""

    assignments: DataFrame  # (id, keep_id, via)
    within: DedupResult     # the full within-batch dedup result

    def unpersist(self) -> None:
        self.within.unpersist()


def incremental_dedup_pipeline(
    df: DataFrame,
    store,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.8,
    bucket_cap: int = 4096,
    est_margin: float = 0.15,
    state_margin: float = 0.0,
    algorithm: str = "star",
    update_state: bool = True,
) -> IncrementalDedupResult:
    """Content dedup of ONE NEW BATCH against the persisted corpus
    state (plans.snapshots.DedupStateStore) — prior batches' parquet
    is never re-read; only their small derived artifacts join in.

    Tier order:
      1. full within-batch dedup (dedup_pipeline: exact -> LSH ->
         exact-jaccard verify -> components);
      2. per-id EXACT state match: batch fingerprints join the
         persisted (fp, keep_id) map — byte-level re-ingests resolve
         here, and a doc's own exact match takes precedence over its
         component's resolution;
      3. NEAR state match for within-batch component keepers: keeper
         signatures (reusing the batch's persisted shingle table) are
         banded with the SAME bucket definition as the stored state
         (_band_signature), joined against the persisted band buckets,
         and candidate (new, old) pairs scored by signature agreement
         est_jaccard >= threshold - state_margin. Cross-batch pairs
         are verified by the 64-hash ESTIMATE, not exact jaccard —
         the honest scale tradeoff: exact verification would require
         persisting per-doc shingle sets (~the corpus size again),
         while signatures are fixed 512 B/keeper. Members inherit
         their keeper's resolution;
      4. state update: every previously-unseen fingerprint is appended
         with its final keeper, and signatures + band buckets of NEW
         keepers are appended — so the next batch resolves against
         this one without re-reading it.

    The widest cross-batch operation is the (band, bucket) join; state
    rows per keeper are fixed-size. At 10^12 docs the state is ~3
    orders of magnitude smaller than the corpus.
    """
    spark = df.sparkSession
    store.check_meta(
        spark, "text", {"n": n, "n_hashes": n_hashes, "bands": bands}
    )
    within = dedup_pipeline(
        df, id_col, text_col, n, n_hashes, bands, threshold,
        bucket_cap, est_margin, algorithm,
    )
    # (id, batch_keep): the within-batch component keeper (min id)
    base = within.keepers.select("id", F.col("component").alias("_bk"))

    fp = df.select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp")
    ).persist()

    has_fp = store.exists(spark, "text_fp")
    if has_fp:
        st_fp = store.read_pinned(spark, "text_fp").select(
            "fp", F.col("keep_id").alias("_st_exact")
        )
        ex = fp.join(st_fp, "fp", "left").select("id", "_st_exact")
    else:
        ex = fp.select(
            "id", F.lit(None).cast(fp.schema["id"].dataType).alias("_st_exact")
        )

    # near-state resolution of component keepers (batch docs whose
    # component found no exact state match may still be near-dups of
    # persisted keepers)
    keeper_ids = base.select(F.col("_bk").alias("_id")).dropDuplicates(["_id"])
    near = None
    if store.exists(spark, "text_bands"):
        sig_k = minhash_signatures(
            None, "_id", None, n, n_hashes,
            shingled=within.shingles.join(keeper_ids, "_id", "left_semi"),
        ).persist()
        banded_k = _band_signature(sig_k, n_hashes, bands)
        st_bands = store.read_pinned(spark, "text_bands").select(
            F.col("id").alias("_old"), "band", "bucket"
        )
        cand = (
            banded_k.join(st_bands, ["band", "bucket"])
            .select(F.col("_id"), F.col("_old"))
            .dropDuplicates(["_id", "_old"])
        )
        st_sig = store.read_pinned(spark, "text_sig").select(
            F.col("id").alias("_old"), F.col("sig").alias("_sig_old")
        )
        est = (
            cand.join(sig_k, "_id")
            .join(st_sig, "_old")
            .withColumn(
                "_est",
                F.size(
                    F.filter(
                        F.zip_with("_sig", "_sig_old", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(float(n_hashes)),
            )
            .filter(F.col("_est") >= threshold - state_margin)
        )
        # best persisted keeper per batch keeper (highest agreement,
        # ties to the smallest old id — deterministic)
        near = (
            est.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("_id").orderBy(
                        F.col("_est").desc(), F.col("_old").asc()
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(F.col("_id").alias("_bk"), F.col("_old").alias("_st_near"))
        )

    # component keeper's own resolution: exact beats near
    k_res = ex.withColumnRenamed("id", "_bk").withColumnRenamed(
        "_st_exact", "_k_exact"
    )
    res = base.join(ex, "id", "left").join(k_res, "_bk", "left")
    if near is not None:
        res = res.join(near, "_bk", "left")
    else:
        res = res.withColumn(
            "_st_near", F.lit(None).cast(fp.schema["id"].dataType)
        )
    assignments = res.select(
        "id",
        F.coalesce("_st_exact", "_k_exact", "_st_near", "_bk").alias("keep_id"),
        F.when(F.col("_st_exact").isNotNull(), F.lit("exact_state"))
        .when(F.col("_k_exact").isNotNull(), F.lit("exact_state"))
        .when(F.col("_st_near").isNotNull(), F.lit("near_state"))
        .when(F.col("_bk") != F.col("id"), F.lit("batch_dup"))
        .otherwise(F.lit("new"))
        .alias("via"),
    )
    # totality: null-text rows never enter dedup_pipeline (nothing to
    # match on) but must still appear in the batch verdict — they keep
    # themselves and contribute no state (null fp filtered below)
    missing = (
        df.select(F.col(id_col).alias("id"))
        .join(assignments.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("keep_id"), F.lit("new").alias("via"))
    )
    assignments = assignments.unionByName(missing).persist()
    within._persisted.append(fp)
    within._persisted.append(assignments)

    if update_state:
        # fingerprint map: one row per previously-unseen fp, mapped to
        # the FINAL keeper its exact-group resolved to
        fp_map = (
            fp.join(assignments, "id")
            .select("fp", "keep_id")
            .filter(F.col("fp").isNotNull())
            .dropDuplicates(["fp"])
        )
        if has_fp:
            fp_map = fp_map.join(
                store.read_pinned(spark, "text_fp").select("fp"),
                "fp",
                "left_anti",
            )
        store.append(fp_map, "text_fp")
        # signatures + buckets for NEW keepers only
        new_ids = assignments.filter(
            (F.col("via") == "new") & (F.col("keep_id") == F.col("id"))
        ).select(F.col("id").alias("_id"))
        sig_new = minhash_signatures(
            None, "_id", None, n, n_hashes,
            shingled=within.shingles.join(new_ids, "_id", "left_semi"),
        ).persist()
        store.append(
            sig_new.select(F.col("_id").alias("id"), F.col("_sig").alias("sig")),
            "text_sig",
        )
        store.append(
            _band_signature(sig_new, n_hashes, bands).select(
                F.col("_id").alias("id"), "band", "bucket"
            ),
            "text_bands",
        )
        sig_new.unpersist()

    return IncrementalDedupResult(assignments=assignments, within=within)
