"""Distributed BPE tokenizer training + encoding.

Classic byte-pair-encoding merge learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") expressed
as DataFrame jobs:

- the corpus reduces ONCE to the distinct (word, count) table — at
  100 TB the distinct vocabulary is millions of rows, not trillions, so
  every subsequent round runs over a small table;
- each merge round is one partial+final hash aggregate over adjacent
  symbol pairs (weighted by word count) and only the single winning
  pair crosses the driver (the bounded-coordination precedent set by
  IVF's centroid collect, ops/similarity.py);
- applying a merge is a JVM-side left fold over the segment array
  (greedy leftmost-first, non-overlapping — the textbook semantics),
  with a localCheckpoint per round so the plan stays flat across
  rounds (the dedup_clusters precedent, ops/dedup.py).

Encoding applies the learned ranks in a single Arrow-batched stage with
the rank table shipped in the task closure (GPT-2-style rank-greedy
merge loop, memoized per distinct word within each batch).

Determinism: winner selection orders by (count DESC, left ASC,
right ASC) over STRUCT pair keys — exact integer counts and binary
string order, identical in the pure-Python twin (``train_bpe_py``,
tuple keys), so the learned merge list is bit-reproducible across
engines and cluster sizes. Struct keys (not a joined string) mean a
separator character appearing inside a symbol can never make two
distinct pairs collide.

Reference scope: the reference (ukdataservice/qamd) has no tokenizer;
this extends the training-data-pipeline surface (token_count_bpe /
fertility_by_lang use a FIXED regex tokenizer — this is the learned
one that the fertility/token-budget math ultimately serves).

Unicode note: symbols are Java UTF-16 code units on the Spark side and
codepoints in the twin — identical for all BMP text (the corpora here);
astral codepoints would split differently and are out of scope.
"""

from __future__ import annotations

from typing import Iterable

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Java regex \s (the training-side tokenizer) is the ASCII class below —
# NOT Python's Unicode \s (which also matches NBSP etc.). The encoder and
# the pure-Python twin split on exactly this class so training and
# encoding always agree on what a word is.
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_words(text: str | None) -> list[str]:
    """Python twin of the Spark-side tokenization (lower + \\s+ split +
    drop empties). str.lower() vs Java toLowerCase differ only on locale
    edge cases (e.g. dotted İ) absent from these corpora."""
    return [w for w in _JAVA_WS_RE.split((text or "").lower()) if w]


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> distinct (word, count): the one full-corpus pass."""
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    tok = F.explode(F.split(t, r"\s+", -1)).alias("word")
    return (
        df.select(tok)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _apply_merge(segs, left: str, right: str):
    """Greedy leftmost non-overlapping merge of (left, right) -> left+right
    as a JVM left fold (no Python)."""
    a, b = F.lit(left), F.lit(right)
    return F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, pair_count)]
    in rank order. Stops early when the best remaining pair occurs fewer
    than ``min_pair_count`` times."""
    words = (
        word_counts(df, text_col)
        .withColumn("segs", F.split(F.col("word"), ""))
        .select("cnt", "segs")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair = F.explode(
            F.zip_with(
                F.slice("segs", 1, F.greatest(F.size("segs") - 1, F.lit(0))),
                F.slice("segs", 2, F.greatest(F.size("segs") - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("l"), y.alias("r")),
            )
        ).alias("p")
        best = (
            words.select("cnt", pair)
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right, int(best[0]["n"])))
        prev = words
        words = words.select(
            "cnt", _apply_merge(F.col("segs"), left, right).alias("segs")
        ).localCheckpoint(eager=True)
        prev.unpersist()
    words.unpersist()
    return merges


def merges_df(spark: SparkSession, merges: Iterable[tuple[str, str, int]]) -> DataFrame:
    rows = [(i, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count long"
    )


# ----------------------------------------------------------------- encoding
def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE encode of one word (GPT-2 encoder loop): repeatedly
    merge the lowest-rank adjacent pair. Identical to replaying the merge
    list in order (proved by test_bpe.py's replay property)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge ALL leftmost non-overlapping occurrences of that pair
        a, b = syms[best_i], syms[best_i + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — learned-BPE tokens of the
    lower/trim/whitespace-split words, concatenated in order. One
    Arrow-batched stage; the rank dict rides the task closure (64 kB-ish
    for thousands of merges) and each distinct word in a batch is encoded
    once."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    fields = df.schema.fieldNames()

    @F.pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_text(t):
            toks: list[str] = []
            for w in _py_words(t):  # same word boundary as training
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                toks.extend(got)
            return toks

        return s.map(enc_text)

    return df.select(*fields, _enc(F.col(text_col)).alias(out_col))


# ------------------------------------------------------------- exact twin
def train_bpe_py(
    wc: dict[str, int], num_merges: int = 50, min_pair_count: int = 2
) -> list[tuple[str, str, int]]:
    """Pure-Python twin of train_bpe over a word->count dict (same
    tie-break: count desc, then (left, right) tuple ascending by
    codepoint — binary order on the corpora's BMP text, matching
    Spark's (l ASC, r ASC) over UTF-8 binary string order)."""
    segs = {w: list(w) for w in wc}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, ss in segs.items():
            c = wc[w]
            for i in range(len(ss) - 1):
                p = (ss[i], ss[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_pair_count:
            break
        merges.append((a, b, n))
        for w, ss in segs.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == a and ss[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            segs[w] = out
    return merges
