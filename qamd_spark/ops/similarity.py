"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  query side is broadcast; dot products are JVM-side higher-order
  functions (zip_with + aggregate), no Python in the hot path.
- lsh_topk: random-hyperplane LSH variant — the scale path. Each vector
  gets a b-bit signature from fixed (deterministic) hyperplanes; top-k is
  computed only within matching buckets (multi-probe over all queries'
  buckets), turning the O(N·Q) crossJoin into a bucket-equi-join that
  shuffles on the signature. Recall < 1 by construction; the baseline is
  the oracle for it.

At 100 TB: brute force is only sane for tiny Q (broadcast) — the plan is
scan-once, narrow, so it parallelizes perfectly; LSH bounds the candidate
set when Q is large. An IVF variant would k-means the corpus first; LSH
avoids the training pass and is deterministic, which we need.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
) -> DataFrame:
    """Exact cosine top-k of emb rows for each query row (queries small →
    broadcast). Returns (qid, neighbor, sim, rank)."""
    e = emb.select(F.col(id_col).alias("_nid"), _as_double(vec_col).alias("_e"))
    q = queries.select(F.col(qid_col).alias("qid"), _as_double(qvec_col).alias("_q"))
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("_nid") != F.col("qid"))
    sim = _dot("_e", "_q") / (_norm("_e") * _norm("_q"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        pairs.select("qid", F.col("_nid").alias("neighbor"), sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def signature_col(vec_col, planes: np.ndarray):
    """b-bit LSH signature as a long, computed JVM-side: for each plane,
    the sign of the dot product contributes one bit."""
    sig = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in row])
        d = _dot(_as_double(vec_col), plane)
        sig = sig + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    A (q, n) pair is a candidate if they share the b-bit bucket in ANY of
    the L tables (recall ≈ 1 − (1 − p_bit^b)^L, p_bit = 1 − θ/π). Each
    vector emits L (table, sig) rows; the equi-join on (table, sig)
    replaces the O(N·Q) crossJoin, and candidates are deduped before the
    exact rescoring. bits/n_tables trade candidate volume for recall —
    defaults are tuned for mid-similarity neighbors; raise n_tables for
    near-orthogonal corpora.
    """
    e_base = emb.select(F.col(id_col).alias("_nid"), _as_double(vec_col).alias("_e"))
    q_base = queries.select(F.col(qid_col).alias("qid"), _as_double(qvec_col).alias("_q"))

    def with_sigs(df, vec_field):
        sigs = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, bits, seed=7 + 97 * t)
            sigs.append(
                F.struct(
                    F.lit(t).alias("tbl"), signature_col(vec_field, planes).alias("sig")
                )
            )
        return df.withColumn("_ts", F.explode(F.array(*sigs))).select(
            "*", F.col("_ts.tbl").alias("tbl"), F.col("_ts.sig").alias("sig")
        ).drop("_ts")

    # signatures travel WITHOUT the vector payload (ids only through the
    # explode/join); vectors are joined back just for the exact rescore
    e = with_sigs(e_base, F.col("_e")).select("_nid", "tbl", "sig")
    q = with_sigs(q_base, F.col("_q")).select("qid", "tbl", "sig")
    cand = (
        e.join(F.broadcast(q), ["tbl", "sig"])
        .filter(F.col("_nid") != F.col("qid"))
        .select("qid", "_nid")
        .dropDuplicates(["qid", "_nid"])
    )
    cand = cand.join(e_base, "_nid").join(F.broadcast(q_base), "qid")
    sim = _dot("_e", "_q") / (_norm("_e") * _norm("_q"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        cand.select("qid", F.col("_nid").alias("neighbor"), sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
