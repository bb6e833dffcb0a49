"""SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
"Subword Regularization", §3 — the unigram language model tokenizer;
public algorithm, re-derived here as a DataFrame job).

This is the second trainable tokenizer family next to ops/bpe.py:
where BPE grows a vocabulary bottom-up by merging pairs, the unigram
LM starts from an over-complete substring vocabulary and prunes it
down under an EM-estimated piece distribution. We implement the
deterministic hard-EM (Viterbi-EM) variant:

  seed   : all substrings (length 1..max_piece_len) of the word
           histogram, weighted by corpus count; top ``seed_size`` by
           (count desc, piece asc) plus EVERY single character seen
           (guarantees every word stays segmentable).
  E-step : Viterbi-segment each DISTINCT word under the current piece
           log-probs — one Arrow-batched stage over the word HISTOGRAM
           (vocabulary-sized, not corpus-sized), piece table in the
           task closure, per-batch memoisation.
  M-step : integer piece counts (sum of word counts along Viterbi
           paths) via partial+final hash aggregate; probabilities are
           recomputed on the driver from the collected counts.
  prune  : keep all single characters + the top multi-char pieces by
           (count desc, piece asc) until ``vocab_size``.

Determinism: all counts are exact integers; log-probs are
``log(c) - log(total)`` on the same int64s in both the Spark path and
the pure-Python twin (shared helpers below), so results are bit-equal.
Viterbi ties break toward the smaller split point (longer last piece).

Scale: the corpus is touched exactly once (word histogram = one
partial+final hash aggregate); every EM iteration runs over the
histogram; only the piece table (<= seed_size rows of short strings)
ever reaches the driver per iteration — the same bounded-coordination
contract as similarity.ivf_train's centroid collect.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qamd_spark.ops.bpe import word_counts, _py_words

__all__ = [
    "viterbi_segment",
    "train_unigram",
    "train_unigram_py",
    "unigram_encode",
]


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: DP over end
    positions, candidates bounded by ``max_piece_len``. Ties prefer the
    smaller split point (the longer last piece) — strictly-greater
    update, scanning split points in ascending order. Unsegmentable
    words (a character missing from ``logp``) come back whole."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            p = logp.get(word[j:i])
            if p is None or best[j] == neg:
                continue
            s = best[j] + p
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == neg:
        return [word]
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _logp_from_counts(counts: dict[str, int]) -> dict[str, float]:
    """log(c) - log(total) on exact int64s — the ONE formula shared by
    the Spark path and the pure-Python twin (bit-equal by construction).
    Zero-count pieces are dropped."""
    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items() if c > 0}


def _prune(
    counts: dict[str, int], vocab_size: int
) -> dict[str, int]:
    """All single characters + top multi-char pieces by
    (count desc, piece asc) until vocab_size."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    keep = dict(chars)
    for p, c in multi:
        if len(keep) >= max(vocab_size, len(chars)):
            break
        keep[p] = c
    return keep


def _seed_pieces(
    words: DataFrame, max_piece_len: int, seed_size: int
) -> dict[str, int]:
    """Corpus-weighted substring counts from the word histogram; top
    ``seed_size`` by (count desc, piece asc) plus every single char.
    sequence(1, x) is always ascending here (x >= 1 for every start
    position), so no descending-sequence trap."""
    subs = F.explode(
        F.flatten(
            F.expr(
                "transform(sequence(1, length(word)), s -> "
                f"transform(sequence(1, least({int(max_piece_len)}, "
                "length(word) - s + 1)), l -> substring(word, s, l)))"
            )
        )
    ).alias("piece")
    counts = (
        words.select(F.col("cnt"), subs)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    top = counts.orderBy(
        F.col("n").desc(), F.col("piece").asc()
    ).limit(int(seed_size))
    chars = counts.filter(F.length("piece") == 1)
    rows = top.unionByName(chars).dropDuplicates(["piece"]).collect()
    return {r["piece"]: int(r["n"]) for r in rows}


def _estep_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """One Viterbi-E-step over the word histogram: piece counts weighted
    by word count, aggregated JVM-side, collected bounded (<= current
    vocab size rows)."""
    items = tuple(sorted(logp.items()))
    mpl = int(max_piece_len)

    @F.pandas_udf("array<string>")
    def _seg(s: pd.Series) -> pd.Series:
        lp = dict(items)
        memo: dict[str, list[str]] = {}

        def seg(w):
            got = memo.get(w)
            if got is None:
                got = memo[w] = viterbi_segment(w, lp, mpl)
            return got

        return s.map(seg)

    per = (
        words.select("cnt", F.explode(_seg(F.col("word"))).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    return {r["piece"]: int(r["n"]) for r in per.collect()}


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 300,
    seed_size: int = 1000,
    max_piece_len: int = 6,
    iters: int = 3,
) -> list[tuple[str, int, float]]:
    """Train the unigram-LM vocabulary; returns
    [(piece, count, logp)] sorted by (count desc, piece asc).

    Note: hard-EM keeps only pieces that win at least one Viterbi path
    — characters the corpus never needs as fallback drop out, so words
    unseen at encode time pass through whole (viterbi_segment's
    unsegmentable contract) rather than erroring."""
    words = word_counts(df, text_col).localCheckpoint(eager=True)
    counts = _seed_pieces(words, max_piece_len, seed_size)
    for _ in range(int(iters)):
        logp = _logp_from_counts(counts)
        counts = _estep_counts(words, logp, max_piece_len)
        counts = _prune(counts, vocab_size)
    words.unpersist()
    logp = _logp_from_counts(counts)
    out = [(p, c, logp[p]) for p, c in counts.items()]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def train_unigram_py(
    word_cnt: dict[str, int],
    vocab_size: int = 300,
    seed_size: int = 1000,
    max_piece_len: int = 6,
    iters: int = 3,
) -> list[tuple[str, int, float]]:
    """Pure-Python twin of train_unigram over a {word: count} histogram
    — same seeding, same shared viterbi/logp/prune helpers, so the
    equality test is exact, not approximate."""
    sub: dict[str, int] = {}
    for w, c in word_cnt.items():
        for s in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - s) + 1):
                p = w[s : s + l]
                sub[p] = sub.get(p, 0) + c
    top = sorted(sub.items(), key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    counts = dict(top)
    for p, c in sub.items():
        if len(p) == 1:
            counts[p] = c
    for _ in range(int(iters)):
        logp = _logp_from_counts(counts)
        nxt: dict[str, int] = {}
        for w, c in word_cnt.items():
            for p in viterbi_segment(w, logp, max_piece_len):
                nxt[p] = nxt.get(p, 0) + c
        counts = _prune(nxt, vocab_size)
    logp = _logp_from_counts(counts)
    out = [(p, c, logp[p]) for p, c in counts.items()]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def pieces_df(
    spark: SparkSession, pieces: list[tuple[str, int, float]]
) -> DataFrame:
    return spark.createDataFrame(
        pieces, "piece string, cnt long, logp double"
    )


def unigram_encode(
    df: DataFrame,
    pieces: list[tuple[str, int, float]],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int = 6,
) -> DataFrame:
    """Apply half: Viterbi-segment every word of ``text_col`` under the
    trained piece log-probs (same word boundary as training). One
    Arrow-batched stage; the piece table rides the closure."""
    items = tuple((p, lp) for p, _, lp in pieces)
    mpl = int(max_piece_len)
    fields = df.schema.fieldNames()

    @F.pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        lp = dict(items)
        memo: dict[str, list[str]] = {}

        def enc(t):
            toks: list[str] = []
            for w in _py_words(t):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = viterbi_segment(w, lp, mpl)
                toks.extend(got)
            return toks

        return s.map(enc)

    return df.select(*fields, _enc(F.col(text_col)).alias(out_col))
