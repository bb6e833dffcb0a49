"""Content-defined chunking (CDC) for insertion-robust storage dedup.

Fixed-offset or fixed-n-gram shingling breaks on a one-byte insertion:
every downstream chunk boundary shifts, so every chunk hash changes and
the duplicate is invisible. CDC (Muthitacharoen et al. SOSP'01 LBFS;
the Gear/FastCDC formulation of Xia et al. USENIX ATC'16) places
boundaries where a rolling hash of the local byte window hits a mask,
so boundaries RE-SYNCHRONIZE a few bytes after an edit and the
untouched tail of the document keeps its chunk identities. At 100 TB
this is the storage-level dedup primitive: chunk once (narrow
Arrow-batched map stage), then duplicate detection is a hash aggregate
on chunk_hash — never a pairwise comparison.

Rolling hash is the Gear construction h = (h << 1) + G[b] (mod 2^64):
the shift ages bytes out after 64 steps, so h_i depends on exactly the
last 64 bytes. We compute it VECTORIZED via the closed form

    h_i = sum_{k=0..63} G[b_{i-k}] << k   (mod 2^64)

(terms with k >= 64 vanish mod 2^64) — 64 shifted whole-buffer adds
over the concatenated batch instead of a per-byte Python loop. Bytes of
the PREVIOUS document in the packed batch are excluded per shift (the
within-doc offset must be >= k), which makes every hash identical to
running the recurrence from h = 0 at the document start: chunking is
batch-composition-independent by construction (the invariant pinned by
tests, after the winnow w>k lesson — see ops/text.py).

The gear table itself derives from sha256 of each single byte value —
a fixed, public, reproducible constant (no RNG, no seed coordination
across executors).

Boundary rule (FastCDC-style normalization is omitted for determinism
clarity): a position with (h & mask) == 0 is a candidate; chunks are
cut greedily at the first candidate giving length >= min_size, with a
forced cut at max_size. Expected chunk length between candidates is
2^avg_bits bytes.

Reference analogue: the reference's duplicate detection is value-exact
(DuplicateValues, src/check/cross.rs) — CDC is the substring-level
generalization a transcript corpus needs when near-identical turns
differ by a few inserted tokens.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame

# Fixed public gear table: first 8 bytes of sha256 of each byte value.
_GEAR = np.array(
    [
        int.from_bytes(hashlib.sha256(bytes([b])).digest()[:8], "big")
        for b in range(256)
    ],
    dtype=np.uint64,
)

CDC_MIN_SIZE = 16
CDC_MAX_SIZE = 256
CDC_AVG_BITS = 6  # candidate every ~2^6 = 64 bytes


def _gear_hashes(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Gear hash at every position of the packed byte buffer, with
    cross-document contributions masked out.

    buf: uint8 concatenated document bytes; offsets: within-document
    offset of each position (0 at each document start). The result at
    position i equals the sequential recurrence h = (h << 1) + G[b]
    restarted at that document's first byte.
    """
    g = _GEAR[buf]
    h = g.copy()
    for k in range(1, 64):
        if k >= len(buf):
            break
        add = g[:-k] << np.uint64(k)
        valid = offsets[k:] >= k
        h[k:] += np.where(valid, add, np.uint64(0))
    return h


def _doc_cuts(cand: np.ndarray, n: int, min_size: int, max_size: int) -> list[int]:
    """Greedy boundary selection for one document.

    cand: sorted within-doc offsets where the mask fired (a candidate at
    offset c means "cut after byte c", chunk end = c + 1); n: doc bytes.
    Returns chunk end positions (exclusive), last always == n.
    """
    ends: list[int] = []
    start = 0
    while start < n:
        forced = min(start + max_size, n)
        lo = np.searchsorted(cand, start + min_size - 1, side="left")
        cut = forced
        if lo < len(cand) and cand[lo] + 1 <= forced:
            cut = int(cand[lo]) + 1
        ends.append(cut)
        start = cut
    return ends


def _cdc_batch(
    texts: list,
    min_size: int = CDC_MIN_SIZE,
    max_size: int = CDC_MAX_SIZE,
    avg_bits: int = CDC_AVG_BITS,
):
    """Chunk a batch of texts; returns (row_idx, pos, chunk_hash,
    chunk_len) parallel arrays. chunk_hash is the first 8 bytes of
    md5(chunk bytes) as a signed int64 (Spark LongType-compatible)."""
    bufs = [(t if isinstance(t, str) else "").encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        z = np.array([], dtype=np.int64)
        return z, z, z, z
    packed = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    offsets = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    h = _gear_hashes(packed, offsets)
    mask = np.uint64((1 << avg_bits) - 1)
    hits = np.flatnonzero((h & mask) == 0)

    ridx: list[int] = []
    pos: list[int] = []
    chash: list[int] = []
    clen: list[int] = []
    hit_docs = np.searchsorted(starts, hits, side="right") - 1
    for d in range(len(bufs)):
        n = int(lens[d])
        if n == 0:
            continue
        cand = hits[hit_docs == d] - starts[d]
        start = 0
        for end in _doc_cuts(cand, n, min_size, max_size):
            chunk = bufs[d][start:end]
            digest = hashlib.md5(chunk).digest()[:8]
            ridx.append(d)
            pos.append(start)
            chash.append(int.from_bytes(digest, "big", signed=True))
            clen.append(end - start)
            start = end
    return (
        np.array(ridx, dtype=np.int64),
        np.array(pos, dtype=np.int64),
        np.array(chash, dtype=np.int64),
        np.array(clen, dtype=np.int64),
    )


def cdc_chunk_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = CDC_MIN_SIZE,
    max_size: int = CDC_MAX_SIZE,
    avg_bits: int = CDC_AVG_BITS,
) -> DataFrame:
    """(doc_id, pos, chunk_hash, chunk_len) rows — one per CDC chunk.

    Narrow Arrow-batched map stage (only id + text cross into Python);
    downstream dedup is groupBy(chunk_hash) — a partial+final hash
    aggregate, never a pairwise join. min_size must be >= 1 and
    <= max_size; avg_bits in [1, 32].
    """
    if not (1 <= min_size <= max_size):
        raise ValueError(f"need 1 <= min_size <= max_size, got {min_size}/{max_size}")
    if not (1 <= avg_bits <= 32):
        raise ValueError(f"avg_bits must be in [1, 32], got {avg_bits}")
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("pos", T.LongType()),
            T.StructField("chunk_hash", T.LongType()),
            T.StructField("chunk_len", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ridx, pos, chash, clen = _cdc_batch(
                list(pdf[text_col]),
                min_size=min_size,
                max_size=max_size,
                avg_bits=avg_bits,
            )
            ids = pdf[id_col].to_numpy(dtype=np.int64)[ridx] if len(ridx) else ridx
            yield pd.DataFrame(
                {"doc_id": ids, "pos": pos, "chunk_hash": chash, "chunk_len": clen}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
