"""Word-level transcript alignment: word error rate (WER) and word
edit distance — the speech-corpus validation metric the reference's
transcript-equality check generalizes to (exact equality is WER==0).

Reference parity: the reference compares transcripts for strict
equality per row (per-row invariant in BASELINE.json input_hint);
real ASR/speech pipelines grade *how far* a transcript is from the
reference, so WER is first-class here.

Scale design — the Levenshtein DP stays JVM-side:

  * Word-level edit distance reduces EXACTLY to character-level edit
    distance after an injective word -> single-char mapping applied
    to both token sequences. Spark's `levenshtein` (Apache Commons,
    whole-stage codegen) then does the DP — no Python DP loop ever.
  * `vocab=` path (known lexicon): the mapping is a LITERAL
    `create_map`, the whole operator is pure Column expressions
    (zero Python). Out-of-vocab tokens all map to one <unk> symbol,
    the standard ASR convention — two different OOV words compare
    equal; pass a bigger vocab if that matters.
  * general path (unbounded vocab): a pandas UDF builds the word ->
    char map PER ROW over the union of both token lists (exact for
    any vocabulary; ~6 dict ops/word, Arrow-batched) and emits the
    two mapped strings; distance/WER still computed JVM-side.
    Mapped chars stay in the BMP (0x0100..0xD7FF, ~55k distinct
    words per row) so one word == one UTF-16 code unit — Commons
    levenshtein counts code units, so a supplementary-plane mapping
    would silently double-count.

Null semantics: either side NULL -> distance/WER NULL (unknown, not
zero). Empty ref with non-empty hyp -> WER = n_hyp (insertions /
max(n_ref, 1)); both empty -> 0.0.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# injective word->char range: BMP only (see module docstring)
_CHAR_BASE = 0x0100
_CHAR_MAX = 0xD7FF

# ONE tokenizer for both paths: Java's \s class ([ \t\n\x0B\f\r]) —
# the vocab path splits JVM-side with split(_, "\\s+"), so the pandas
# path must use the same ASCII class (python str.split() would also
# split on U+00A0 etc. and yield a different WER for the same row)
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_UNK = ""  # single <unk> char, outside the mapped range


def _tokens(c: Column) -> Column:
    """Whitespace tokens, empty-safe: '' and all-space -> [] (not ['']).
    Mirrors text.token_count's tokenizer so counts agree."""
    t = F.trim(c)
    return F.when(t.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))
    )


def _encode_vocab(toks: Column, mapping: Column) -> Column:
    """tokens -> mapped string via a literal map; OOV -> <unk> char."""
    return F.array_join(
        F.transform(
            # try_element_at: ANSI mode (PySpark 4 default) makes
            # plain element_at THROW on a missing map key
            toks,
            lambda t: F.coalesce(F.try_element_at(mapping, t), F.lit(_UNK)),
        ),
        "",
    )


# explicit StructType: a DDL string would be parsed at import time and
# require an active SparkSession (same constraint as audio/checks.py)
_PAIR_SCHEMA = T.StructType(
    [T.StructField("h", T.StringType()), T.StructField("r", T.StringType())]
)


@pandas_udf(_PAIR_SCHEMA)
def _map_word_pairs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-row injective word->char encoding of (hyp, ref) token
    lists. The map is built fresh per row (exact, vocabulary-free);
    both outputs use the same map so equal words align."""
    for pdf in it:
        hs: list = []
        rs: list = []
        for h, r in zip(pdf["h"], pdf["r"]):
            if h is None or r is None:
                hs.append(None)
                rs.append(None)
                continue
            m: dict = {}

            def enc(s: str) -> str:
                out = []
                for t in _JAVA_WS.split(s):
                    if not t:
                        continue
                    c = m.get(t)
                    if c is None:
                        code = _CHAR_BASE + len(m)
                        if code > _CHAR_MAX:
                            raise ValueError(
                                "word_error_rate: >55k distinct words in "
                                "one row; chunk the transcript"
                            )
                        c = chr(code)
                        m[t] = c
                    out.append(c)
                return "".join(out)

            hs.append(enc(h))
            rs.append(enc(r))
        yield pd.DataFrame({"h": hs, "r": rs})


def word_error_rate(
    df: DataFrame,
    hyp_col: str,
    ref_col: str,
    vocab: Sequence[str] | None = None,
    out_prefix: str = "wer",
) -> DataFrame:
    """Append `<p>_distance` (word-level Levenshtein, long),
    `<p>_ref_words` (long) and `<p>` (double, distance/max(ref,1)).

    vocab: known lexicon -> pure-Column path (OOV tokens collapse to
    one <unk> symbol); None -> exact per-row mapping via one
    Arrow-batched pandas UDF (DP still JVM-side either way).
    """
    p = out_prefix
    if vocab is not None:
        n = len(vocab)
        if n > _CHAR_MAX - _CHAR_BASE:
            raise ValueError("vocab too large for single-char mapping")
        if len(set(vocab)) != n:
            raise ValueError("vocab contains duplicates")
        pairs: list[Column] = []
        for i, w in enumerate(vocab):
            pairs.append(F.lit(w))
            pairs.append(F.lit(chr(_CHAR_BASE + i)))
        mapping = F.create_map(*pairs)
        ht = _tokens(F.col(hyp_col))
        rt = _tokens(F.col(ref_col))
        h_m = _encode_vocab(ht, mapping)
        r_m = _encode_vocab(rt, mapping)
        out = df.withColumn("_wer_h", h_m).withColumn("_wer_r", r_m)
    else:
        mapped = _map_word_pairs(
            F.struct(
                F.col(hyp_col).alias("h"), F.col(ref_col).alias("r")
            )
        )
        out = (
            df.withColumn("_wer_m", mapped)
            .withColumn("_wer_h", F.col("_wer_m.h"))
            .withColumn("_wer_r", F.col("_wer_m.r"))
            .drop("_wer_m")
        )
    dist = F.when(
        F.col("_wer_h").isNotNull() & F.col("_wer_r").isNotNull(),
        F.levenshtein("_wer_h", "_wer_r"),
    ).cast("long")
    ref_n = F.when(
        F.col("_wer_r").isNotNull(), F.length("_wer_r")
    ).cast("long")
    return (
        out.withColumn(f"{p}_distance", dist)
        .withColumn(f"{p}_ref_words", ref_n)
        .withColumn(
            p,
            (
                F.col(f"{p}_distance")
                / F.greatest(F.col(f"{p}_ref_words"), F.lit(1))
            ).cast("double"),
        )
        .drop("_wer_h", "_wer_r")
    )


def wer_label(
    wer: Column, max_wer: float = 0.25, name: str = "transcript_wer_above"
) -> Column:
    """Soft-tier label echoing the offending value, reference style
    (`fast_rt_...` labels, core_models.py:169-202):
    `transcript_wer_above(0.33)` or NULL."""
    return F.when(
        wer.isNotNull() & (wer > max_wer),
        F.concat(
            F.lit(f"{name}("),
            F.round(wer, 2).cast("string"),
            F.lit(")"),
        ),
    )
