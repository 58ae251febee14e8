"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd); the regex/token
primitives are chosen so a DuckDB oracle can reproduce them exactly
(md5 + regexp_extract_all exist in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword regexes for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in|that|it|was|for)\b",
    "es": r"\b(el|la|de|que|y|en|los|del|las|por)\b",
    "de": r"\b(der|die|und|das|ist|von|den|nicht|mit|ein)\b",
    "fr": r"\b(le|la|les|de|des|et|est|une|dans|que)\b",
}


def normalized_text(c: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def token_count(c: Column) -> Column:
    """Whitespace tokenization count; empty/null -> 0."""
    t = F.trim(c)
    return F.when(
        t.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish regex token count: word pieces + digits + punctuation as
    separate tokens (approximates subword tokenizer counts)."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)))


def lang_scores(c: Column) -> dict[str, Column]:
    """Stopword-marker hit counts per language over normalized text."""
    norm = normalized_text(c)
    return {
        lang: F.size(F.regexp_extract_all(norm, F.lit(rx), F.lit(0)))
        for lang, rx in LANG_MARKERS.items()
    }


def lang_id(c: Column, min_hits: int = 1) -> Column:
    """argmax of marker hits; ties and sub-threshold -> 'und'.
    Deterministic tie-break: language order as declared."""
    scores = lang_scores(c)
    best = None
    best_score = None
    for lang, s in scores.items():
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score >= min_hits, best).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring feature columns (ratios in [0,1])."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = token_count(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    stop_hits = F.size(
        F.regexp_extract_all(normalized_text(c), F.lit(LANG_MARKERS["en"]), F.lit(0))
    )
    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_tokens": toks,
            "q_mean_word_len": F.when(toks > 0, F.round(alpha / toks, 4)).otherwise(
                F.lit(0.0)
            ),
            "q_alpha_ratio": F.when(n_chars > 0, F.round(alpha / n_chars, 4)).otherwise(
                F.lit(0.0)
            ),
            "q_punct_ratio": F.when(n_chars > 0, F.round(punct / n_chars, 4)).otherwise(
                F.lit(0.0)
            ),
            "q_stopword_ratio": F.when(toks > 0, F.round(stop_hits / toks, 4)).otherwise(
                F.lit(0.0)
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Single scalar quality score in [0,1]: length band + alpha ratio
    + stopword presence - punctuation excess."""
    feat = quality_features(df, text_col)
    len_band = F.least(F.col("q_n_tokens") / F.lit(20.0), F.lit(1.0))
    score = (
        0.4 * len_band
        + 0.3 * F.col("q_alpha_ratio")
        + 0.3 * F.least(F.col("q_stopword_ratio") * 2, F.lit(1.0))
        - 0.2 * F.greatest(F.col("q_punct_ratio") - 0.1, F.lit(0.0))
    )
    return feat.withColumn(
        "quality_score", F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 4)
    )


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (md5 exists in both Spark and DuckDB -> oracle-safe)."""
    return F.md5(normalized_text(c))


def word_ngrams(c: Column, n: int = 3) -> Column:
    """Array of word n-grams (shingles) from normalized text.

    The token array is bound ONCE via a single-element transform
    lambda: referencing the split() expression directly inside the
    per-gram lambda would re-inline (and re-execute) the whole
    normalize+split subtree for every element_at — measured ~8x
    slower on 300-char documents.
    """

    def build(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
        return F.when(
            F.size(toks) >= n,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bound = F.transform(
        F.array(F.split(normalized_text(c), " ")), lambda toks: build(toks)
    )
    return F.element_at(bound, 1)


def winnow_fingerprints(
    c: Column, n: int = 3, window: int = 4
) -> Column:
    """ROLLING-HASH document fingerprints via MOSS winnowing
    (Schleimer/Wilkerson/Aiken 2003, the public algorithm): hash every
    word n-gram, slide a window of `window` consecutive hashes, keep
    each window's minimum — the classic guarantee that any shared run
    of >= n+window-1 words between two documents shares at least one
    selected fingerprint, while storing only ~2/(window+1) of the
    hashes. -> sorted distinct array<string> of selected md5 hashes
    (lexicographic min: any total order works for winnowing, and hex
    strings compare identically in every engine — no hex->int
    conversion an oracle could disagree on).

    Documents with fewer than n words yield an empty array; documents
    with 1..window-1 n-grams yield the single global min (every doc
    with any content gets at least one fingerprint). Pure Column
    algebra on the same shared-token pass as word_ngrams — no UDF,
    no shuffle.
    """
    grams = word_ngrams(c, n)

    def build(hs: Column) -> Column:
        m = F.size(hs)
        wins = (
            F.when(m <= 0, F.array().cast("array<string>"))
            .when(m < window, F.array(F.array_min(hs)))
            .otherwise(
                F.transform(
                    F.sequence(F.lit(1), m - window + 1),
                    lambda j: F.array_min(F.slice(hs, j, window)),
                )
            )
        )
        return F.array_sort(F.array_distinct(wins))

    hashes = F.transform(grams, lambda g: F.md5(g.cast("binary")))
    return F.element_at(
        F.transform(F.array(hashes), lambda hs: build(hs)), 1
    )


MOJIBAKE_PATTERN = "(Ã.)|(â€.)|�|(Â )"


def mojibake_count(c: Column) -> Column:
    """Occurrences of classic encoding-damage signatures: UTF-8 bytes
    re-decoded as Latin-1/cp1252 ('Ã©' for é, 'â€™' for a smart
    quote, 'Â ' for nbsp) and the replacement character U+FFFD. The
    corpus-cleaning screen for double-encoded scrapes — cheap enough
    to ride any text scan (one regexp_count, no UDF)."""
    return F.coalesce(
        F.regexp_count(c, F.lit(MOJIBAKE_PATTERN)), F.lit(0)
    ).cast("long")


def mojibake_flag(c: Column, per_kchar_max: float = 1.0) -> Column:
    """Soft label `text_mojibake(k)` when damage signatures exceed
    per_kchar_max per 1000 characters; NULL when clean or empty."""
    n = mojibake_count(c)
    rate = F.when(
        F.length(c) > 0, n * F.lit(1000.0) / F.length(c)
    ).otherwise(F.lit(0.0))
    return F.when(
        rate > per_kchar_max,
        F.concat(
            F.lit("text_mojibake("), n.cast("string"), F.lit(")")
        ),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Repetition quality filters (the published massive-corpus
    heuristics: documents dominated by repeated lines or a single
    repeated phrase are boilerplate/spam, not prose):

      rep_n_lines             newline-separated line count
      rep_dup_line_frac       (n_lines - n_distinct_lines) / n_lines:
                              the fraction of line slots beyond each
                              line's first occurrence (0 when every
                              line is unique)
      rep_dup_line_char_frac  fraction of line characters living in
                              duplicated lines
      rep_top2gram_char_frac  characters covered by occurrences of the
                              most frequent word 2-gram / total
                              normalized text length (ties break to
                              the longer gram, then lexicographically
                              — fully deterministic). 0 when no
                              2-gram repeats: a short document whose
                              top gram occurs once has no REPETITION,
                              which is what this feature measures

    Pure Column algebra (array_distinct + nested filter), O(L^2) /
    O(G^2) per document — L and G are per-document line/gram counts,
    fine at prose scale and embarrassingly parallel across rows; a
    book-length outlier pays its own quadratic cost only. Replayable
    verbatim in DuckDB list comprehensions (oracle q126)."""
    c = F.col(text_col)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    dup_lines = F.filter(
        lines,
        lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1,
    )
    chars = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, F.length), F.lit(0), lambda a, v: a + v
    )
    total_chars = chars(lines)
    grams = word_ngrams(c, 2)
    # top-frequency gram in O(G log G): sort, then ONE aggregate scans
    # runs of equal adjacent grams, keeping the best (cnt, glen, gram)
    # under the same tiebreak the naive O(G^2) count used. The naive
    # nested-filter version cost 48 s over 5k sf0.1 documents; this
    # form is linear after the sort.
    sg = F.array_sort(grams)

    def _roll(acc, g):
        run = F.when(g == acc.getField("prev"), acc.getField("run") + 1).otherwise(
            F.lit(1)
        )
        # when the previous run just ended, fold it into the best
        ended = g != acc.getField("prev")
        pc = acc.getField("run")
        pl = F.length(acc.getField("prev"))
        pg = acc.getField("prev")
        better = ended & (
            (pc > acc.getField("best_cnt"))
            | (
                (pc == acc.getField("best_cnt"))
                & (
                    (pl > acc.getField("best_glen"))
                    | (
                        (pl == acc.getField("best_glen"))
                        & (pg > acc.getField("best_gram"))
                    )
                )
            )
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, pc).otherwise(acc.getField("best_cnt")).alias(
                "best_cnt"
            ),
            F.when(better, pl).otherwise(acc.getField("best_glen")).alias(
                "best_glen"
            ),
            F.when(better, pg).otherwise(acc.getField("best_gram")).alias(
                "best_gram"
            ),
        )

    def _finish(acc):
        pc = acc.getField("run")
        pl = F.length(acc.getField("prev"))
        pg = acc.getField("prev")
        better = (acc.getField("prev") != "") & (
            (pc > acc.getField("best_cnt"))
            | (
                (pc == acc.getField("best_cnt"))
                & (
                    (pl > acc.getField("best_glen"))
                    | (
                        (pl == acc.getField("best_glen"))
                        & (pg > acc.getField("best_gram"))
                    )
                )
            )
        )
        return F.struct(
            F.when(better, pc)
            .otherwise(acc.getField("best_cnt"))
            .alias("cnt"),
            F.when(better, pl)
            .otherwise(acc.getField("best_glen"))
            .alias("glen"),
        )

    top = F.aggregate(
        sg,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best_cnt"),
            F.lit(0).alias("best_glen"),
            F.lit("").alias("best_gram"),
        ),
        _roll,
        _finish,
    )
    norm_len = F.length(normalized_text(c))
    return df.select(
        "*",
        n_lines.alias("rep_n_lines"),
        F.when(
            n_lines > 0,
            F.round(
                (n_lines - n_distinct) / n_lines.cast("double"), 6
            ),
        ).otherwise(F.lit(0.0)).alias("rep_dup_line_frac"),
        F.when(
            total_chars > 0,
            F.round(chars(dup_lines) / total_chars.cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("rep_dup_line_char_frac"),
        F.when(
            (F.size(grams) > 0)
            & (norm_len > 0)
            & (top.getField("cnt") >= 2),
            F.round(
                top.getField("cnt")
                * top.getField("glen")
                / norm_len.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("rep_top2gram_char_frac"),
    )


def repetition_flag(
    df: DataFrame,
    text_col: str = "text",
    dup_line_max: float = 0.3,
    dup_line_char_max: float = 0.2,
    top2gram_char_max: float = 0.2,
) -> DataFrame:
    """repetition_features + the boolean `rep_flagged` (any heuristic
    over its published-default bound)."""
    feat = repetition_features(df, text_col)
    return feat.withColumn(
        "rep_flagged",
        (F.col("rep_dup_line_frac") > dup_line_max)
        | (F.col("rep_dup_line_char_frac") > dup_line_char_max)
        | (F.col("rep_top2gram_char_frac") > top2gram_char_max),
    )
