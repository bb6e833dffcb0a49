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
_NONWS_RX = re.compile(r"\S+")

SCORE_COLUMNS = [
    "n_chars",
    "n_tokens",
    "odd_char_ratio",
    "stopword_fraction",
    "all_stopwords",
    "repetition_ratio",
    "oov_fraction",
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
    norm: pd.Series, stopwords: frozenset, vocab: frozenset | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(stopword_fraction, all_stopwords, repetition_ratio, oov_fraction)
    per row. oov_fraction = fraction of tokens NOT in ``vocab`` (0 when
    vocab is None or the row is empty) — the spellcheck-predicate analogue
    (reference src/check/dictionary.rs:15-17): an empty string passes, and
    empty tokens from consecutive spaces are OOV, mirroring only_contains.

    Tokens = norm.split(' ') (single space, QAMD semantics). Empty/null
    string ⇒ fraction 0, all_stopwords False (mirrors the reference
    stopword predicate passing empty strings, src/check/dictionary.rs:22-24),
    repetition 0; repetition counts non-empty tokens only.

    Vectorized via pd.factorize (one C-level string→code hash pass over
    all tokens): stopword membership is a set lookup on the UNIQUE tokens
    only; per-row sums via np.add.reduceat; repetition mode via a single
    lexsort + run-length pass on the int codes. Both the Spark stage and
    the oracle run THIS function, so results are identical by construction.
    """
    n = len(norm)
    frac = np.zeros(n, dtype=np.float64)
    allstop = np.zeros(n, dtype=bool)
    rep = np.zeros(n, dtype=np.float64)
    oov = np.zeros(n, dtype=np.float64)
    if n == 0:
        return frac, allstop, rep, oov
    vals = ["" if not isinstance(v, str) else v for v in norm.tolist()]
    # marker char: NOT \x00 — pandas' string hash table C-truncates at
    # embedded NULs (factorize collides "" with "\x00", and generally any
    # token with a NUL-extension twin, batch-dependently); \x01 hashes
    # fine. Batches bearing either byte take the row-wise branch with
    # exact dict-based codes so token identity uses full strings.
    if any("\x01" in v or "\x00" in v for v in vals):  # rare batch: row-wise
        toks_per_row = [v.split(" ") for v in vals]
        lens = np.fromiter((len(t) for t in toks_per_row), dtype=np.int64, count=n)
        flat: list[str] = [tok for toks in toks_per_row for tok in toks]
        from qamd_spark.ops.dedup import _exact_codes

        codes, uniques = _exact_codes(flat)
    else:
        # one C-level split of the " \x01 "-joined batch instead of n
        # Python-level splits + a flatten loop. The marker is always a
        # standalone token (space-delimited on both sides by the join),
        # so per-row token runs are exactly the segments between marker
        # tokens — identical to v.split(" ") per row, including the empty
        # tokens QAMD semantics depend on ("" rows and consecutive
        # spaces; reference src/check/dictionary.rs:117-122).
        flat_all = " \x01 ".join(vals).split(" ")
        codes_all, uniques = pd.factorize(np.asarray(flat_all, dtype=object))
        midx = np.flatnonzero(uniques == "\x01")
        if len(midx):
            is_marker = codes_all == midx[0]
            mpos = np.flatnonzero(is_marker)
            bounds = np.concatenate(
                (np.array([-1]), mpos, np.array([len(flat_all)]))
            )
            lens = np.diff(bounds) - 1
            codes = codes_all[~is_marker]
        else:  # n == 1: no join happened, no markers
            lens = np.array([len(flat_all)], dtype=np.int64)
            codes = codes_all
    uniq_is_stop = np.fromiter(
        (u in stopwords for u in uniques), dtype=bool, count=len(uniques)
    )
    is_stop = uniq_is_stop[codes]
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    nstop = np.add.reduceat(is_stop.astype(np.int64), offsets)
    nonempty = np.asarray([v != "" for v in vals], dtype=bool)
    frac = np.where(nonempty, nstop / np.maximum(lens, 1), 0.0)
    allstop = nonempty & (nstop == lens)
    if vocab is not None:
        uniq_in_vocab = np.fromiter(
            (u in vocab for u in uniques), dtype=bool, count=len(uniques)
        )
        n_oov = np.add.reduceat((~uniq_in_vocab[codes]).astype(np.int64), offsets)
        oov = np.where(nonempty, n_oov / np.maximum(lens, 1), 0.0)
    # repetition: mode count of NON-empty tokens / their total, per row
    empty_idx = np.flatnonzero(uniques == "")
    empty_code = int(empty_idx[0]) if len(empty_idx) else -1
    ne = codes != empty_code
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    rh, rr = codes[ne], rows[ne]
    if len(rh):
        order = np.lexsort((rh, rr))
        sh, sr = rh[order], rr[order]
        new_run = np.ones(len(sh), dtype=bool)
        new_run[1:] = (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])
        run_starts = np.flatnonzero(new_run)
        run_lengths = np.diff(np.append(run_starts, len(sh)))
        run_row = sr[run_starts]
        max_per_row = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_per_row, run_row, run_lengths)
        ntok_ne = np.bincount(rr, minlength=n)
        rep = np.where(ntok_ne > 0, max_per_row / np.maximum(ntok_ne, 1), 0.0)
    return frac, allstop, rep, oov


def odd_char_counts(text: pd.Series, odd_chars: list[str]) -> np.ndarray:
    """Total non-overlapping occurrences of each odd substring per row.

    The odd set defaults to the reference's (default.yaml:111-119:
    & # '  ' @ * ç ô ü). Count-based ratio generalizes the reference's
    boolean `contains` (src/check/mod.rs:94-99).

    Single-character entries fold into ONE character-class regex pass
    (their counts are disjoint, so the sum equals per-char counting);
    multi-character entries (the double-space) keep their own pass —
    non-overlapping counts of different substrings aren't class-foldable.
    """
    total = np.zeros(len(text), dtype=np.int64)
    singles = [c for c in odd_chars if len(c) == 1]
    multis = [c for c in odd_chars if len(c) != 1]
    if singles:
        cls = re.compile("[" + "".join(re.escape(c) for c in singles) + "]")
        total += text.str.count(cls).fillna(0).to_numpy(dtype=np.int64)
    for c in multis:
        total += text.str.count(re.escape(c)).fillna(0).to_numpy(dtype=np.int64)
    return total


def score_pdf(pdf: pd.DataFrame, cfg) -> pd.DataFrame:
    """Append SCORE_COLUMNS to a transcript batch. Pure per-turn function.

    ``cfg`` is a qamd_spark.config.QamdConfig (only per-turn settings are
    read: odd chars, stopwords, pii patterns, profanity lexicon).
    """
    text = pdf["text"]
    out = pdf.copy()
    out["n_chars"] = text.str.len().fillna(0).astype(np.int32)
    # whitespace tokens for the token-count feature (count of \S+ runs ==
    # len(str.split()) without materializing the token lists)
    out["n_tokens"] = text.str.count(_NONWS_RX).fillna(0).astype(np.int32)
    odd = odd_char_counts(text, cfg.odd_chars)
    nchars = out["n_chars"].to_numpy(dtype=np.float64)
    out["odd_char_ratio"] = np.where(nchars > 0, odd / np.maximum(nchars, 1), 0.0)
    norm = normalize_series(text)
    frac, allstop, rep, oov = _token_stats(norm, cfg.stopword_set, cfg.vocab_set)
    out["stopword_fraction"] = frac
    out["all_stopwords"] = allstop
    out["repetition_ratio"] = rep
    out["oov_fraction"] = oov
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
    if cfg.enabled("quality_classifier"):
        # trained-model score; weights resolved by ensure_qc_model in the
        # DRIVER (or oracle) process and shipped on cfg — executors never
        # train (BLAS nondeterminism, see qamd_spark/classifier.py)
        from qamd_spark import classifier

        w, b, _thr = cfg.ensure_qc_model()
        out["qc_score"] = classifier.score_quality(text.tolist(), w, b)
    if cfg.enabled("compression"):
        # zlib compressibility — same C library in every executor and in
        # the oracle process (one container), so the ratio is twin-exact;
        # the ratio is one IEEE division of exact integer lengths
        from qamd_spark.ops.text import _compression_batch

        nb, nc = _compression_batch(text.tolist())
        out["cr_ratio"] = [
            (c / b) if b > 0 else None for b, c in zip(nb, nc)
        ]
    return out
