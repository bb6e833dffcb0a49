"""Near-duplicate detection for large-scale training-data pipelines.

Beyond the reference's exact DuplicateValues check (reference
src/check/post.rs:229-260 — exact value-occurrence counting), these are
the standard web-scale near-dup operators:

- exact_duplicates: hash-groupBy keep-first (also in qamd_spark.pipeline)
- minhash_duplicates: shingle → minhash → LSH band bucketing → bucket join
- simhash_signatures: 64-bit simhash per doc (Hamming-near dups)
- ngram_jaccard_pairs: exact Jaccard over candidate pairs (verification
  stage after LSH banding)

All scoring is vectorized numpy inside Arrow-batched pandas UDFs; banding
and candidate joins are native DataFrame shuffles so Catalyst/AQE handle
skew. Hashes are deterministic polynomial/multiply-shift functions (no
Python hash(), which is seed-randomized).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic 64-bit mixing constants (splitmix64)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """64-bit hashes of the k-word shingles of a (lowercased) text."""
    toks = text.lower().split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    n = len(toks) - k + 1
    out = np.empty(max(n, 1), dtype=np.uint64)
    h0 = np.uint64(1469598103934665603)
    prime = np.uint64(1099511628211)
    for i in range(max(n, 1)):
        h = h0
        for t in toks[i : i + k]:
            for b in t.encode("utf-8"):
                h = ((h ^ np.uint64(b)) * prime) & _MASK
            h = ((h ^ np.uint64(0x20)) * prime) & _MASK
        out[i] = h
    return out


N_PERM = 64
N_BANDS = 16  # 16 bands x 4 rows — catches Jaccard >= ~0.5 w.h.p.
ROWS_PER_BAND = N_PERM // N_BANDS

# fixed permutation constants derived deterministically from splitmix64
_PERM_A = _splitmix64(np.arange(1, N_PERM + 1, dtype=np.uint64)) | np.uint64(1)
_PERM_B = _splitmix64(np.arange(101, 101 + N_PERM, dtype=np.uint64))


def _minhash_signature(sh: np.ndarray) -> np.ndarray:
    # (n_shingles, 1) * (N_PERM,) -> min over shingles per permutation
    v = (sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) & _MASK
    return v.min(axis=0)


_MINHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ]
)


def minhash_bands(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc → N_BANDS (band, band_hash) rows. Pandas-UDF stage, narrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bands, hashes = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str) or not text:
                    continue
                sig = _minhash_signature(_shingle_hashes(text))
                for b in range(N_BANDS):
                    chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                    h = np.uint64(b + 1)
                    for c in chunk:
                        h = _splitmix64(h ^ c)
                    ids.append(doc_id)
                    bands.append(b)
                    hashes.append(np.int64(h))
            yield pd.DataFrame({"doc_id": ids, "band": bands, "band_hash": hashes})

    return docs.select(id_col, text_col).mapInPandas(run, schema=_MINHASH_SCHEMA)


def minhash_duplicates(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH candidate near-dups: docs sharing any band bucket.

    Returns (doc_id, dup_of) with dup_of = the smallest doc id in any
    shared bucket (keep-first convention); only rows where dup_of < doc_id.
    Scale shape: bands shuffle on (band, band_hash) — a self-join-free
    min-per-bucket broadcast-back; giant buckets (boilerplate text) are
    bounded by the min() aggregation, not a pairwise explosion.
    """
    bands = minhash_bands(docs, id_col=id_col)
    bucket_min = bands.groupBy("band", "band_hash").agg(
        F.min("doc_id").alias("bucket_min")
    )
    joined = bands.join(bucket_min, ["band", "band_hash"])
    cand = (
        joined.filter(F.col("bucket_min") < F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.min("bucket_min").alias("dup_of"))
    )
    return cand.select("doc_id", "dup_of")


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit simhash over word-unigram hashes (vectorized numpy)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str) or not text:
                    ids.append(doc_id)
                    sigs.append(0)
                    continue
                toks = text.lower().split()
                hs = np.empty(len(toks), dtype=np.uint64)
                for i, t in enumerate(toks):
                    h = np.uint64(1469598103934665603)
                    for b in t.encode("utf-8"):
                        h = ((h ^ np.uint64(b)) * np.uint64(1099511628211)) & _MASK
                    hs[i] = h
                bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
                votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
                sig = np.uint64(0)
                for bit in np.where(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(bit)
                ids.append(doc_id)
                sigs.append(np.int64(sig))
            yield pd.DataFrame({"doc_id": ids, "simhash": sigs})

    return docs.select(id_col, text_col).mapInPandas(run, schema=_SIMHASH_SCHEMA)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup keep-first by id order (window form; the pipeline uses
    the skew-safe agg+join form — see qamd_spark/pipeline.py)."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    return docs.select(
        id_col, (F.row_number().over(w) > 1).alias("is_dup")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (a, b).

    candidates: DataFrame(a, b) — typically the minhash LSH output.
    Joins text for both sides (broadcast if small) then scores pairs in a
    pandas-UDF stage. This is the verify stage of the classic
    LSH-then-verify dedup pipeline.
    """
    ta = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("text_a"))
    tb = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("text_b"))
    pairs = candidates.join(ta, "a").join(tb, "b")

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            js = []
            for x, y in zip(pdf["text_a"], pdf["text_b"]):
                sa = _ngram_set(x, n)
                sb = _ngram_set(y, n)
                u = len(sa | sb)
                js.append(len(sa & sb) / u if u else 1.0)
            out = pdf[["a", "b"]].copy()
            out["jaccard"] = np.array(js, dtype=np.float64)
            yield out

    return pairs.mapInPandas(run, schema=schema)


def _ngram_set(text, n: int) -> set:
    if not isinstance(text, str):
        return set()
    toks = text.lower().split()
    if len(toks) < n:
        return {tuple(toks)} if toks else set()
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}
