"""Hashed character-trigram models: language ID + perplexity.

Deterministic, dependency-free substitutes for fastText lid.176 and a
KenLM-style trigram LM (BASELINE.json north_star). Tables are built once at
import from the frozen corpora in :mod:`qamd_spark.corpora`, so every
process — Spark executor Python workers and the single-node oracle — holds
bit-identical float64 tables and produces bit-identical scores.

Scoring is fully vectorized over an Arrow batch: all texts are joined into
one byte buffer, trigram hashes are computed with numpy slicing, and
per-document sums fall out of ``np.add.reduceat``. No per-row Python in the
hot loop (input_hint requirement).

Hash: rolling polynomial over UTF-8 bytes, mod a 2^15 table — the classic
hashed-n-gram trick (hash collisions are part of the model, as in fastText's
bucketed n-grams).
"""

from __future__ import annotations

import numpy as np

from qamd_spark import corpora

TABLE_BITS = 15
TABLE = 1 << TABLE_BITS
LANGS = ("en", "fr", "de", "es", "it", "pt", "nl", "sv",
         "pl", "fi", "tr", "id", "zh", "ja", "ko", "ru", "ar")
# fixed order; argmax tie-break = first
UND = "und"
PPL_EMPTY = 1.0e9  # sentinel perplexity for texts with no trigrams
_SEP = 0xFF  # never occurs in valid UTF-8


def _trigram_hashes(buf: np.ndarray) -> np.ndarray:
    """Polynomial trigram hash over a uint8 buffer -> int64 in [0, TABLE)."""
    a = buf.astype(np.int64)
    h = a[:-2] * (31 * 31) + a[1:-1] * 31 + a[2:]
    return h & (TABLE - 1)


def _build_table(text: str) -> np.ndarray:
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    hashes = _trigram_hashes(data)
    counts = np.bincount(hashes, minlength=TABLE).astype(np.float64)
    n = counts.sum()
    # add-0.5 smoothing over the hashed vocabulary
    return np.log((counts + 0.5) / (n + 0.5 * TABLE))


# Frozen model tables (float64, shape (n_langs, TABLE)).
LANG_TABLES = np.stack([_build_table(corpora.LANG_CORPORA[l]) for l in LANGS])
# The perplexity LM is the English table (the "target distribution").
LM_TABLE = LANG_TABLES[LANGS.index("en")]


def _batch_buffers(texts) -> tuple[np.ndarray, np.ndarray]:
    """Join texts (None -> empty) into one buffer with 0xFF separators.

    Returns (buffer uint8, doc start offsets int64). Each doc contributes
    its bytes followed by two separator bytes, so no trigram spans docs.
    """
    parts = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    pos = 0
    sep = b"\xff\xff"
    for i, t in enumerate(texts):
        offsets[i] = pos
        b = t.lower().encode("utf-8") if isinstance(t, str) else b""
        parts.append(b)
        parts.append(sep)
        pos += len(b) + 2
    offsets[len(texts)] = pos
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8)
    return buf, offsets


CHUNK_DOCS = 16384  # keep per-chunk temporaries cache-sized (see below)


def score_texts(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Score a batch of texts.

    Returns (lang: object array of str, lang_margin: float64 array,
    perplexity: float64 array). ``lang`` is 'und' when the text has no
    trigrams. Perplexity = exp(-mean trigram logprob under the English LM);
    PPL_EMPTY when no trigrams.

    Large batches are processed in CHUNK_DOCS chunks: the gather/reduceat
    temporaries are O(total bytes) per language, and a monolithic 200k-doc
    batch allocates gigabytes of fresh pages (measured 10x slower from
    first-touch page faults alone). Chunking is score-neutral — per-doc
    scores are independent of batch boundaries (tested).
    """
    n = len(texts)
    if n > CHUNK_DOCS:
        parts = [
            score_texts(texts[i : i + CHUNK_DOCS]) for i in range(0, n, CHUNK_DOCS)
        ]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )
    if n == 0:
        return (
            np.empty(0, dtype=object),
            np.empty(0, dtype=np.float64),
            np.empty(0, dtype=np.float64),
        )
    buf, offsets = _batch_buffers(texts)
    # pad 2 trailing separators so EVERY doc's reduceat segment spans
    # exactly len+2 positions, including the last doc of the batch.
    # np.add.reduce sums segments PAIRWISE and the tree shape depends on
    # segment length — without the padding the batch's final doc had a
    # 2-shorter segment and its float sums could differ by 1-2 ulp from
    # the same doc scored mid-batch (batch-composition dependence). The
    # padded positions are separator-masked zeros: x + 0.0 is exact, so
    # only the tree shape (now position-independent) changes.
    buf = np.concatenate([buf, np.full(2, _SEP, dtype=np.uint8)])
    hashes = _trigram_hashes(buf)
    # docs with fewer than 3 text bytes have no trigrams at all
    empty = (offsets[1:] - offsets[:-1] - 2) < 3
    if len(hashes) == 0:
        return (
            np.full(n, UND, dtype=object),
            np.zeros(n, dtype=np.float64),
            np.full(n, PPL_EMPTY, dtype=np.float64),
        )
    # mask out any trigram touching a separator byte
    is_sep = buf == _SEP
    valid = ~(is_sep[:-2] | is_sep[1:-1] | is_sep[2:])
    # offsets are strictly increasing and offsets[n] == len(hashes) after
    # the padding, so every start is in range — no clamping needed
    starts = offsets[:-1]
    counts = np.add.reduceat(valid.astype(np.int64), starts)
    vf = valid.astype(np.float64)
    # NB: keep the per-language 1-D gather+reduceat loop — a single
    # (n, n_langs) gather with an axis-0 reduceat measured 4.5x SLOWER
    # (2-D reduceat's segment loop is not vectorized over columns)
    lang_sums = np.empty((len(LANGS), n), dtype=np.float64)
    for li in range(len(LANGS)):
        lp = LANG_TABLES[li][hashes] * vf
        lang_sums[li] = np.add.reduceat(lp, starts)
    safe = np.maximum(counts, 1)
    means = lang_sums / safe
    no_grams = (counts <= 0) | empty
    best = np.argmax(means, axis=0)
    order = np.sort(means, axis=0)
    margin = order[-1] - order[-2] if len(LANGS) > 1 else np.zeros(n)
    langs = np.array([LANGS[b] for b in best], dtype=object)
    langs[no_grams] = UND
    margin = np.where(no_grams, 0.0, margin)
    # the perplexity LM is the English table, so its per-doc sums were
    # already computed in the language loop — reuse, bit-identically
    lm_sums = lang_sums[LANGS.index("en")]
    ppl = np.exp(-(lm_sums / safe))
    ppl = np.where(no_grams, PPL_EMPTY, ppl)
    return langs, margin, ppl
