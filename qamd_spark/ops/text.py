"""Text-analysis operators for training-data pipelines.

All JVM-side Column expressions unless noted — language-ID/perplexity live
in qamd_spark/ngram.py (pandas-UDF path). These compose with the rule
pipeline but are also exposed standalone for corpus analytics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact ASCII punctuation class (mirrors reference normalize_word,
# src/check/dictionary.rs:110-115); valid in Java regex and RE2
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"

# a BPE-ish word/number/punct splitter: words, digit runs, single punct
TOKEN_RX = r"[A-Za-z]+(?:'[a-z]+)?|\d+|[^\sA-Za-z\d]"


def token_count(text: Column) -> Column:
    """Whitespace token count (cheap); null/empty → 0."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+", -1)))


def bpe_ish_token_count(text: Column) -> Column:
    """Regex token count approximating a BPE pre-tokenizer's word splits."""
    return F.size(
        F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(TOKEN_RX), F.lit(0))
    )


def punct_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    stripped = F.regexp_replace(t, PUNCT_CLASS, "")
    return F.when(
        F.length(t) > 0,
        (F.length(t) - F.length(stripped)).cast("double") / F.length(t).cast("double"),
    ).otherwise(0.0)


def uppercase_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    low = F.regexp_replace(t, r"[A-Z]", "")
    return F.when(
        F.length(t) > 0,
        (F.length(t) - F.length(low)).cast("double") / F.length(t).cast("double"),
    ).otherwise(0.0)


def digit_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    nod = F.regexp_replace(t, r"[0-9]", "")
    return F.when(
        F.length(t) > 0,
        (F.length(t) - F.length(nod)).cast("double") / F.length(t).cast("double"),
    ).otherwise(0.0)


def mean_word_length(text: Column) -> Column:
    t = F.trim(F.coalesce(text, F.lit("")))
    toks = F.split(t, r"\s+", -1)
    return F.when(
        t != "",
        F.aggregate(
            toks, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
        )
        / F.size(toks).cast("double"),
    ).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1] — the classic
    length/punct/caps/digit gate (C4/Gopher-style rules, expressed as one
    weighted score). Deterministic fixed-order double arithmetic."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t).cast("double")
    len_ok = F.when((n >= 20) & (n <= 5000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    p = punct_ratio(text)
    u = uppercase_ratio(text)
    d = digit_ratio(text)
    penalty = (
        F.when(p > 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(u > 0.3, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(d > 0.3, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    score = len_ok - penalty
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), score))


def rolling_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: xxhash64 of the
    whitespace-normalized, lowercased text (content-defined identity for
    exact dedup across whitespace variants)."""
    norm = F.lower(F.regexp_replace(F.trim(F.coalesce(text, F.lit(""))), r"\s+", " "))
    return F.xxhash64(norm)


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis feature set (narrow, codegen-fused)."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("tok_ws"),
        bpe_ish_token_count(t).alias("tok_bpe"),
        punct_ratio(t).alias("punct_ratio"),
        uppercase_ratio(t).alias("upper_ratio"),
        digit_ratio(t).alias("digit_ratio"),
        mean_word_length(t).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        rolling_fingerprint(t).alias("fingerprint64"),
    )
