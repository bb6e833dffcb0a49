"""fastText-style document quality classifier.

A supervised LINEAR model over hashed character-4-gram features (the
hashing trick, mean-pooled — the fastText architecture with bucketed
subword features), trained deterministically at import time from frozen
in-repo data, so every process (Spark executor Python workers and the
single-node twin) holds bit-identical float64 weights and produces
bit-identical scores. This is the trained-classifier counterpart to the
heuristic ``ops/text.quality_score`` gate: CCNet/LLaMA-style pipelines
run exactly such a linear quality model after the heuristic filters.

Training data needs no external corpus: positives are prose windows from
:mod:`qamd_spark.corpora` (the langid corpora — natural text in 8
languages); negatives are deterministic junk generators (token loops,
character runs, symbol/digit soup, keyword stuffing) seeded with a fixed
``RandomState``. The model is logistic regression trained by full-batch
gradient descent with a fixed iteration count and learning rate —
deterministic float64 end to end, no early stopping, no RNG after data
generation.

Scoring is fully vectorized over an Arrow batch with the same
byte-buffer + ``np.add.reduceat`` kernel as :mod:`qamd_spark.ngram`
(no per-row Python in the hot loop, per input_hint). Scores are
batch-composition-invariant (tested) because each doc's pooled feature
sum only touches its own byte range.
"""

from __future__ import annotations

import numpy as np

from qamd_spark import corpora
from qamd_spark.ngram import _batch_buffers

QC_BITS = 13
QC_DIM = 1 << QC_BITS
QC_EMPTY = 0.0  # score for docs with no 4-grams (null/empty/too short)
_SEP = 0xFF

_TRAIN_ITERS = 1500
_TRAIN_LR = 20.0
_TRAIN_L2 = 1e-5


def _4gram_hashes(buf: np.ndarray) -> np.ndarray:
    """Polynomial char-4-gram hash over a uint8 buffer -> [0, QC_DIM)."""
    a = buf.astype(np.int64)
    h = a[:-3] * (31 * 31 * 31) + a[1:-2] * (31 * 31) + a[2:-1] * 31 + a[3:]
    return h & (QC_DIM - 1)


def _pooled_features(texts) -> np.ndarray:
    """Mean-pooled hashed-4-gram count vectors, shape (n, QC_DIM)."""
    n = len(texts)
    X = np.zeros((n, QC_DIM), dtype=np.float64)
    for i, t in enumerate(texts):
        b = np.frombuffer(
            t.lower().encode("utf-8") if isinstance(t, str) else b"",
            dtype=np.uint8,
        )
        if len(b) < 4:
            continue
        h = _4gram_hashes(b)
        counts = np.bincount(h, minlength=QC_DIM).astype(np.float64)
        X[i] = counts / len(h)
    return X


def _training_set() -> tuple[list[str], np.ndarray]:
    """Deterministic labeled corpus: prose positives, junk negatives."""
    pos: list[str] = []
    for lang in sorted(corpora.LANG_CORPORA):
        # script-aware: char tokens for unsegmented CJK, words elsewhere
        words = corpora.corpus_tokens(lang)
        sep = "" if lang in corpora.UNSEGMENTED_LANGS else " "
        # overlapping 30-token windows, stride 15
        for s in range(0, max(len(words) - 30, 1), 15):
            pos.append(sep.join(words[s : s + 30]))
    rng = np.random.RandomState(0)
    neg: list[str] = []
    junk_tokens = ["spam", "buy", "click", "free", "win", "now", "deal", "xxx"]
    symbols = list("#$%&*+=@~^<>[]{}|\\/!?.,;:'\"()-_`")
    # token loops: one per junk token (full coverage), plus random mixes
    for tok in junk_tokens:
        neg.append(" ".join([tok] * 20))
    for _ in range(len(pos) // 8):
        picks = [junk_tokens[rng.randint(len(junk_tokens))] for _ in range(12)]
        neg.append(" ".join(picks * 3))
    # character runs: one per char over the WHOLE ASCII-ish space
    # (letters + digits + symbols) — deterministic full coverage, so any
    # single-char run maps to a trained bucket, not the bias
    run_chars = (
        [chr(ord("a") + i) for i in range(26)] + list("0123456789") + symbols
    )
    for ch in run_chars:
        neg.append(ch * 60)
    # glued short symbol runs ('$$$###@@@' shapes) and symbol soup
    for _ in range(len(pos) // 4):
        n = 3 + rng.randint(6)
        neg.append(
            "".join(
                symbols[rng.randint(len(symbols))] * (3 + rng.randint(4))
                for _ in range(n)
            )
        )
    for _ in range(len(pos) // 4):
        n = 40 + rng.randint(120)
        neg.append("".join(symbols[rng.randint(len(symbols))] for _ in range(n)))
    # digit soup (spaced numbers — covers digit-digit and digit-space grams)
    for _ in range(len(pos) // 4):
        n = 15 + rng.randint(30)
        neg.append(" ".join(str(rng.randint(10**6)) for _ in range(n)))
    texts = pos + neg
    y = np.concatenate(
        [np.ones(len(pos), dtype=np.float64), np.zeros(len(neg), dtype=np.float64)]
    )
    return texts, y


def _train() -> tuple[np.ndarray, float, float]:
    texts, y = _training_set()
    X = _pooled_features(texts)
    w = np.zeros(QC_DIM, dtype=np.float64)
    b = 0.0
    n = len(y)
    for _ in range(_TRAIN_ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= _TRAIN_LR * ((X.T @ g) / n + _TRAIN_L2 * w)
        b -= _TRAIN_LR * float(g.mean())
    # calibrate the keep threshold on the training margin, biased toward
    # the negative side: held-out prose contains unseen 4-gram buckets
    # (zero weight), which pull its pooled score toward sigmoid(b), so
    # the decision boundary must sit well below the lowest TRAIN positive
    z = X @ w + b
    s = 1.0 / (1.0 + np.exp(-z))
    pos_min, neg_max = float(s[y == 1].min()), float(s[y == 0].max())
    thr = neg_max + 0.25 * (pos_min - neg_max)
    return w, b, thr


# Frozen model, trained LAZILY and only in the driver process. The
# training matmuls go through BLAS, whose threaded reductions are NOT
# bit-reproducible across processes with different thread pools (a Spark
# Python worker pins OMP to 1 thread; the driver does not) — so the
# weights are never retrained executor-side. attach_quality_score and
# the pipeline score stage ship the 64 KB vector through the task
# closure (the "broadcast small model" pattern of the fastText-langid
# north star); SCORING is BLAS-free (gather + reduceat), so driver and
# executor scores are bit-identical for the same weights (tested).
# Lazy (not at import) so that executor workers importing this module
# never pay the ~1.5 s training cost they must not use anyway.
_MODEL: tuple[np.ndarray, float, float] | None = None


def get_model() -> tuple[np.ndarray, float, float]:
    """(weights, bias, calibrated_threshold) — trained once per process."""
    global _MODEL
    if _MODEL is None:
        _MODEL = _train()
    return _MODEL


_CHUNK_DOCS = 16384


def score_quality(texts, weights=None, bias=None) -> np.ndarray:
    """Quality probability in [0,1] per text; QC_EMPTY when no 4-grams.

    Vectorized: one byte buffer for the whole batch, per-doc pooled
    weight sums via ``np.add.reduceat``. Chunked like ngram.score_texts
    to keep temporaries cache-sized; chunking is score-neutral.
    """
    if weights is None or bias is None:
        mw, mb, _ = get_model()
        w = mw if weights is None else weights
        b = mb if bias is None else bias
    else:
        w, b = weights, bias
    n = len(texts)
    if n > _CHUNK_DOCS:
        return np.concatenate(
            [
                score_quality(texts[i : i + _CHUNK_DOCS], w, b)
                for i in range(0, n, _CHUNK_DOCS)
            ]
        )
    if n == 0:
        return np.empty(0, dtype=np.float64)
    buf, offsets = _batch_buffers(texts)
    if len(buf) < 4:
        return np.full(n, QC_EMPTY, dtype=np.float64)
    # pad 3 trailing separators so every doc's reduceat segment spans
    # exactly len+2 positions regardless of batch position — reduceat's
    # pairwise summation tree depends on segment length, and without
    # the padding the final doc of a batch summed over a 3-shorter
    # segment (observed 1-ulp batch-composition drift after the
    # 12-language retrain). Padded positions are separator-masked
    # zeros; x + 0.0 is exact. Same fix as ngram.score_texts.
    buf = np.concatenate([buf, np.full(3, _SEP, dtype=np.uint8)])
    hashes = _4gram_hashes(buf)
    is_sep = buf == _SEP
    valid = ~(is_sep[:-3] | is_sep[1:-2] | is_sep[2:-1] | is_sep[3:])
    starts = offsets[:-1]
    counts = np.add.reduceat(valid.astype(np.int64), starts)
    sums = np.add.reduceat(w[hashes] * valid.astype(np.float64), starts)
    safe = np.maximum(counts, 1)
    z = sums / safe + b
    score = 1.0 / (1.0 + np.exp(-z))
    return np.where(counts <= 0, QC_EMPTY, score)


def attach_quality_score(df, text_col: str = "text", threshold: float | None = None):
    """Spark operator: adds ``qc_score`` (double) and ``qc_keep``
    (boolean) columns via one Arrow-batched mapInPandas stage. The
    driver-trained weights (64 KB) ride in the task closure so every
    executor scores with bit-identical parameters — executors never
    retrain (see the note on get_model above)."""
    w, b, cal = get_model()
    thr = cal if threshold is None else threshold

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{fields}, qc_score double, qc_keep boolean"

    def run(batches):
        for pdf in batches:
            s = score_quality(pdf[text_col].tolist(), w, b)
            pdf = pdf.copy()
            pdf["qc_score"] = s
            pdf["qc_keep"] = s >= thr
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
