"""Token-boundary phrase-blocklist matching as a broadcast equi-join.

Corpus curation carries phrase blocklists far larger than the refusal
panel — C4's "bad words" list, boilerplate markers, spam templates run
to thousands of entries. Two properties make the ``contains``-panel
approach (rules/refusal.py) wrong at that size:

* **cost** — a panel of P substring probes is an O(P) predicate chain
  per row; at P in the thousands the projection itself becomes the
  bottleneck (and a single mega-regex alternation hits the same wall
  inside the regex engine, plus literal-size limits in the plan).
* **precision** — substring matching fires on token fragments
  ("buy now" hits "buy nowhere"); blocklists are defined on word
  boundaries.

This module implements the scale path: tokenize once, generate
positional n-grams for exactly the phrase lengths present in the
panel, and equi-join the exploded grams against the phrase table.
The phrase side is broadcast here (panels are KBs); at 10^6-phrase
scale the same plan degrades gracefully to a shuffle hash join on the
gram key — either way the per-row cost is O(tokens x n_lengths),
independent of panel size, and matching is exact on token boundaries.

The reference analogue is the StringValueStopword lexicon check
(reference src/check/post.rs:229-268) generalized from single words to
multi-word phrases; the join-based formulation is the Spark-native
re-expression (a lexicon is a dimension table, membership is a join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Public-knowledge boilerplate/spam phrase panel (lowercase, 2-4 tokens;
# the kind of template text C4/RefinedWeb-style web cleaning strips).
DEFAULT_BLOCKLIST_PHRASES: tuple[str, ...] = (
    "all rights reserved",
    "terms of service",
    "privacy policy applies",
    "click here to subscribe",
    "sign up today",
    "limited time offer",
    "buy now",
    "free shipping on orders",
    "this site uses cookies",
    "lorem ipsum dolor sit",
    "subscribe to our newsletter",
    "follow us on",
    "no purchase necessary",
    "call now",
    "act fast",
    "satisfaction guaranteed or your",
    "click the link below",
    "unsubscribe at any time",
    "offer expires soon",
    "best prices guaranteed",
)


def token_ngrams(tok: Column, n: int) -> Column:
    """Positional space-joined n-grams of a token array.

    Pure Column composition (codegen, no Python): the i-th output is
    tokens i..i+n-1 joined by one space; size(tok) < n yields an empty
    array. Mirrors the lm_score trigram builder, parameterized on n.
    """
    starts = F.slice(tok, 1, F.greatest(F.size(tok) - (n - 1), F.lit(0)))
    return F.transform(starts, lambda x, i: F.concat_ws(" ", F.slice(tok, i + 1, n)))


def tokenize(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped — the shared
    tokenization contract of lm_score / stopword_fraction, so phrase
    semantics line up with every other token-grain operator."""
    return F.filter(F.split(F.lower(text), " "), lambda x: x != "")


def phrase_hits(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    phrases: list[str] | tuple[str, ...],
    id_col: str = "doc_id",
) -> DataFrame:
    """All (id, rank) phrase occurrences in df[text_col], one row per
    positional match. rank is the phrase's index in sorted(phrases) —
    an int so downstream min()/count_distinct() stay in a mutable
    hash-agg buffer (min over strings forces a SortAggregate).

    Plan: one narrow tokenize+gram projection, explode, broadcast hash
    join against the (phrase, rank) dimension. No Python stage.
    """
    panel = sorted(set(phrases))
    lengths = sorted({len(p.split()) for p in panel})
    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    t = df.select(F.col(id_col), toks.alias("_tok"))
    gram_arrays = [token_ngrams(F.col("_tok"), n) for n in lengths]
    grams = gram_arrays[0] if len(gram_arrays) == 1 else F.flatten(
        F.array(*gram_arrays)
    )
    g = t.select(id_col, F.explode(grams).alias("gram"))
    dim = spark.createDataFrame(
        [(p, r) for r, p in enumerate(panel)], schema="phrase string, rank int"
    )
    return g.join(F.broadcast(dim), g["gram"] == dim["phrase"], "inner").select(
        id_col, "rank"
    )
