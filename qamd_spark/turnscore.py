"""Vectorized per-turn scoring — the shared kernel of the engine.

``score_pdf`` computes every per-turn feature/score on a pandas DataFrame
batch. It is called from exactly two places:

1. the Spark pipeline, inside ``mapInPandas`` (Arrow batches — this is the
   "vectorized pandas/Arrow UDFs, no per-row Python" stage the input_hint
   mandates), and
2. the single-node oracle (oracle/oracle.py), on the whole table at once.

Because both paths run literally this function, per-turn scores and
scrubbed text are bit-identical between Spark and the oracle — the
analogue of the reference's exact pass/fail counting contract
(reference src/macros.rs:24-41 ``assert_setting!``).

Tokenization faithfully mirrors QAMyData's dictionary checks
(reference src/check/dictionary.rs:110-122): ``normalize_word`` strips
ASCII punctuation and lowercases the WHOLE string, then tokens are split
on single spaces (consecutive spaces yield empty tokens).
"""

from __future__ import annotations

import re
import string

import numpy as np
import pandas as pd

from qamd_spark import ngram
from qamd_spark.rules import pii as pii_mod

# exact ASCII punctuation set used by Rust's char::is_ascii_punctuation
# (reference src/check/dictionary.rs:110-115)
_ASCII_PUNCT = string.punctuation
_PUNCT_RX = re.compile("[" + re.escape(_ASCII_PUNCT) + "]")

SCORE_COLUMNS = [
    "n_chars",
    "n_tokens",
    "odd_char_ratio",
    "stopword_fraction",
    "all_stopwords",
    "repetition_ratio",
    "pii_hits",
    "profanity_hit",
    "scrubbed_text",
    "lang",
    "perplexity",
]


def normalize_series(text: pd.Series) -> pd.Series:
    """normalize_word over a Series: strip ASCII punctuation, lowercase."""
    return text.str.replace(_PUNCT_RX, "", regex=True).str.lower()


def _token_stats(
    norm: pd.Series, stopwords: frozenset
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(stopword_fraction, all_stopwords, repetition_ratio) per row.

    Tokens = norm.split(' ') (single space, QAMD semantics). Empty string
    (or null) ⇒ fraction 0, all_stopwords False (mirrors the reference
    stopword predicate passing empty strings, src/check/dictionary.rs:22-24),
    repetition 0. Vectorized with explode + groupby.
    """
    n = len(norm)
    frac = np.zeros(n, dtype=np.float64)
    allstop = np.zeros(n, dtype=bool)
    rep = np.zeros(n, dtype=np.float64)
    filled = norm.fillna("")
    nonempty = filled != ""
    if not nonempty.any():
        return frac, allstop, rep
    idx = np.arange(n)
    sub = filled[nonempty.to_numpy()]
    sub.index = idx[nonempty.to_numpy()]
    tokens = sub.str.split(" ")
    ex = tokens.explode()
    is_stop = ex.isin(stopwords)
    g = is_stop.groupby(level=0)
    frac_s = g.mean()
    all_s = g.all()
    n_tok = g.size()
    # repetition over non-empty tokens
    ex_ne = ex[ex != ""]
    if len(ex_ne):
        counts = (
            pd.DataFrame({"i": ex_ne.index, "t": ex_ne.to_numpy()})
            .groupby(["i", "t"])
            .size()
        )
        mode = counts.groupby(level=0).max()
        ntok_ne = ex_ne.groupby(level=0).size()
        rep_s = (mode / ntok_ne).astype(np.float64)
        rep[rep_s.index.to_numpy()] = rep_s.to_numpy()
    frac[frac_s.index.to_numpy()] = frac_s.to_numpy(dtype=np.float64)
    allstop[all_s.index.to_numpy()] = all_s.to_numpy(dtype=bool)
    _ = n_tok
    return frac, allstop, rep


def odd_char_counts(text: pd.Series, odd_chars: list[str]) -> np.ndarray:
    """Total non-overlapping occurrences of each odd substring per row.

    The odd set defaults to the reference's (default.yaml:111-119:
    & # '  ' @ * ç ô ü). Count-based ratio generalizes the reference's
    boolean `contains` (src/check/mod.rs:94-99).
    """
    total = np.zeros(len(text), dtype=np.int64)
    for c in odd_chars:
        cnt = text.str.count(re.escape(c)).fillna(0)
        total += cnt.to_numpy(dtype=np.int64)
    return total


def score_pdf(pdf: pd.DataFrame, cfg) -> pd.DataFrame:
    """Append SCORE_COLUMNS to a transcript batch. Pure per-turn function.

    ``cfg`` is a qamd_spark.config.QamdConfig (only per-turn settings are
    read: odd chars, stopwords, pii patterns, profanity lexicon).
    """
    text = pdf["text"]
    out = pdf.copy()
    out["n_chars"] = text.str.len().fillna(0).astype(np.int32)
    # whitespace tokens for the token-count feature
    out["n_tokens"] = (
        text.str.split().str.len().fillna(0).astype(np.int32)
    )
    odd = odd_char_counts(text, cfg.odd_chars)
    nchars = out["n_chars"].to_numpy(dtype=np.float64)
    out["odd_char_ratio"] = np.where(nchars > 0, odd / np.maximum(nchars, 1), 0.0)
    norm = normalize_series(text)
    frac, allstop, rep = _token_stats(norm, cfg.stopword_set)
    out["stopword_fraction"] = frac
    out["all_stopwords"] = allstop
    out["repetition_ratio"] = rep
    scrubbed, hits, prof = pii_mod.scrub_series(
        text, cfg.pii_pattern_names, cfg.profanity_rx
    )
    out["pii_hits"] = hits
    out["profanity_hit"] = prof
    out["scrubbed_text"] = scrubbed
    langs, margin, ppl = ngram.score_texts(text.tolist())
    # below-margin language calls are downgraded to 'und' (gibberish guard)
    lang = np.where(
        (margin < cfg.lang_min_margin) & (langs != ngram.UND), ngram.UND, langs
    )
    out["lang"] = lang
    out["perplexity"] = ppl
    return out
