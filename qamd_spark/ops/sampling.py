"""Deterministic quota (token-budget) sampling for corpus curation.

``token_budget_sample`` answers the data-mixing question "give me ~B
tokens per language/source, reproducibly": per group, rows are ordered
by a salted md5 of their id (engine-exact, no RNG — the same discipline
as the hash_sample query) and the maximal prefix whose cumulative
weight stays within the budget is kept.

Scale design — exact global prefix-sum WITHOUT a per-group global
window: a ``Window.partitionBy(group).orderBy(h)`` running sum puts an
entire group (at 10^12 rows, a language is ~10^11 rows) into one task.
Instead, the md5 order key is RANGE-chunked on its first two hex chars
(256 ordered ranges, uniform by construction):

  1. per (group, chunk): partial weight sums — one hash aggregate;
  2. per group: chunk offsets = running sum over the <=256 aggregated
     chunk rows (a window over the TINY aggregated table, not raw rows);
  3. offsets join back on (group, chunk) — broadcastable (n_groups*256
     rows) — and a within-chunk running sum bounded by ~N/256 rows per
     task finishes the exact global cumulative weight.

Hex-lexicographic ordering of lowercase md5 equals byte ordering in
both Spark and DuckDB, so the oracle twin can use the straightforward
single-window formulation — the driver gate then PROVES the two-phase
plan computes the same prefix. Weights are exact integers; no floats
anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_pct_keep(id_col: str, salt: str, pct: int):
    """The deterministic salted-md5 percent-keep predicate shared by the
    sample and curate CLIs: md5(salt ':' id) first 8 hex digits as an
    integer, mod 100 < pct. One definition so the two commands can never
    desynchronize (the determinism contract is bit-level)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (h % 100) < int(pct)


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    salt: str = "s",
) -> DataFrame:
    """Rows of ``df`` kept by the per-group budget, with the exact
    cumulative weight. Output: (group_col, id_col, weight_col, cum_weight)
    for kept rows only, where cum_weight <= budget.

    Determinism: order key = (md5(id || ':' || salt), id) — total order,
    reproducible across engines, cluster sizes, and reruns.
    """
    d = (
        df.select(
            F.col(group_col).alias("_grp"),
            F.col(id_col).alias("_id"),
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("_w"),
        )
        .withColumn(
            "_h", F.md5(F.concat(F.col("_id").cast("string"), F.lit(":" + salt)))
        )
        .withColumn("_chunk", F.substring("_h", 1, 2))
    )

    chunk_sums = d.groupBy("_grp", "_chunk").agg(F.sum("_w").alias("_wsum"))
    woff = (
        Window.partitionBy("_grp")
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = chunk_sums.select(
        "_grp",
        "_chunk",
        F.coalesce(F.sum("_wsum").over(woff), F.lit(0)).alias("_off"),
    )
    wcum = (
        Window.partitionBy("_grp", "_chunk")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = d.join(F.broadcast(offs), ["_grp", "_chunk"])
    out = joined.withColumn("_cum", F.col("_off") + F.sum("_w").over(wcum))
    return out.filter(F.col("_cum") <= F.lit(int(budget))).select(
        F.col("_grp").alias(group_col),
        F.col("_id").alias(id_col),
        F.col("_w").alias(weight_col),
        F.col("_cum").alias("cum_weight"),
    )


def shard_assign(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    shard_weight: int,
    salt: str = "s",
) -> DataFrame:
    """Deterministic training-shard assignment: every row, ordered by a
    salted md5 of its id (the corpus-shuffle step of shard writing — no
    RNG, reproducible across engines and cluster sizes), is assigned to
    shard ``(cum_before) div shard_weight`` where cum_before is the
    exact cumulative weight of all rows ordered before it. Rows never
    split; a shard may overflow by at most one row's weight (the
    standard greedy shard-writer contract).

    Output: (id_col, weight_col, cum_weight, shard_id).

    Scale: same range-chunked two-phase prefix sum as
    token_budget_sample, ungrouped — 256 md5-prefix chunks bound every
    window task at ~N/256 rows; the 256-row offsets table broadcasts.
    Weights are exact integers throughout; shard_id is exact integer
    division (truncation — all values non-negative).
    """
    d = (
        df.select(
            F.col(id_col).alias("_id"),
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("_w"),
        )
        .withColumn(
            "_h", F.md5(F.concat(F.col("_id").cast("string"), F.lit(":" + salt)))
        )
        .withColumn("_chunk", F.substring("_h", 1, 2))
    )
    chunk_sums = d.groupBy("_chunk").agg(F.sum("_w").alias("_wsum"))
    woff = Window.orderBy("_chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = chunk_sums.select(
        "_chunk",
        F.coalesce(F.sum("_wsum").over(woff), F.lit(0)).alias("_off"),
    )
    wcum = (
        Window.partitionBy("_chunk")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = d.join(F.broadcast(offs), "_chunk")
    out = joined.withColumn("_cum", F.col("_off") + F.sum("_w").over(wcum))
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_w").alias(weight_col),
        F.col("_cum").alias("cum_weight"),
        F.expr(f"(_cum - _w) div {int(shard_weight)}").alias("shard_id"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    seq_len: int,
    salt: str = "pack",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the GPT-style pretraining
    layout: documents are laid end-to-end in a deterministic corpus order
    (salted md5 of the id, then id) and the token stream is cut into
    fixed seq_len blocks; a document may straddle block boundaries.
    Output per doc: (id_col, weight_col, start_tok, pack_first,
    pack_last, offset_in_pack, n_packs_spanned) — everything a writer
    needs to emit packed sequences shard-locally.

    Scale design: the global token prefix-sum uses the same range-chunked
    two-phase plan as token_budget_sample (the md5 order key is binned on
    its first two hex chars; a window runs only over the 256-row
    aggregated chunk table and within bounded chunks) — no single-task
    global window at 10^12 docs. All arithmetic is exact integers, so
    the DuckDB single-window twin is hash-exact, proving the two-phase
    decomposition correct."""
    d = (
        df.select(
            F.col(id_col).alias("_id"),
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("_w"),
        )
        .withColumn(
            "_h", F.md5(F.concat(F.col("_id").cast("string"), F.lit(":" + salt)))
        )
        .withColumn("_chunk", F.substring("_h", 1, 2))
    )
    chunk_sums = d.groupBy("_chunk").agg(F.sum("_w").alias("_wsum"))
    woff = (
        Window.partitionBy(F.lit(1))
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = chunk_sums.select(
        "_chunk", F.coalesce(F.sum("_wsum").over(woff), F.lit(0)).alias("_off")
    )
    wcum = (
        Window.partitionBy("_chunk")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = d.join(F.broadcast(offs), "_chunk")
    start = F.col("_off") + F.coalesce(F.sum("_w").over(wcum), F.lit(0))
    out = joined.withColumn("_start", start)
    L = int(seq_len)
    # integer `div` keeps everything exact at any corpus size (a double
    # division would lose exactness past 2^53 total tokens)
    out = out.withColumn(
        "_last", F.col("_start") + F.greatest(F.col("_w"), F.lit(1)) - 1
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_w").alias(weight_col),
        F.col("_start").alias("start_tok"),
        F.expr(f"_start div {L}").alias("pack_first"),
        F.expr(f"_last div {L}").alias("pack_last"),
        (F.col("_start") % L).alias("offset_in_pack"),
        (F.expr(f"_last div {L}") - F.expr(f"_start div {L}") + 1)
        .alias("n_packs_spanned"),
    )


# --------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023): score every raw document by the hashed-n-gram log-likelihood
# ratio log p_target(doc) - log p_raw(doc); documents that look like the
# target domain get positive weight and selection keeps the high-weight
# tail. Feature deviation, documented: the paper hashes word uni+bigrams;
# we hash char-4-grams with the repo's existing vectorized byte-buffer
# kernel (same feature family as the fastText-style classifier — no new
# tokenizer, no per-row Python). Both distributions use +1 Laplace
# smoothing over DSIR_DIM buckets.
#
# Scale design: pass 1 reduces the corpus to <= DSIR_DIM (16k) hashed
# bucket counts — each Arrow batch emits its nonzero partial counts,
# a hash aggregate sums them, and ONLY that bounded table reaches the
# driver (the IVF-centroid-collect precedent). The 128 KB lambda vector
# ships back in the task closure for pass 2 scoring. Exact-int counts
# make pass 1 order-free; pass 2's per-doc float sum is a sequential
# bincount fold in position order (see dsir_score_batch), so scores are
# batch-composition invariant and the pandas twin is bit-exact.
# --------------------------------------------------------------------

DSIR_BITS = 14
DSIR_DIM = 1 << DSIR_BITS
_SEP = 0xFF  # _batch_buffers separator; never occurs in UTF-8


def dsir_corpus_counts(texts) -> np.ndarray:
    """Hashed char-4-gram bucket counts (int64[DSIR_DIM]) for a text
    batch, over one separator-joined buffer; grams whose window touches
    a separator byte are masked invalid, so no gram spans documents
    (two consecutive 0xFF separators sit between docs, and any 4-byte
    window crossing a boundary must contain one)."""
    from qamd_spark.ngram import _batch_buffers

    buf, _ = _batch_buffers(texts)
    if len(buf) < 4:
        return np.zeros(DSIR_DIM, dtype=np.int64)
    a = buf.astype(np.int64)
    h = (
        a[:-3] * (31 * 31 * 31) + a[1:-2] * (31 * 31) + a[2:-1] * 31 + a[3:]
    ) & (DSIR_DIM - 1)
    valid = (
        (a[:-3] != _SEP) & (a[1:-2] != _SEP) & (a[2:-1] != _SEP) & (a[3:] != _SEP)
    )
    return np.bincount(h[valid], minlength=DSIR_DIM).astype(np.int64)


def dsir_score_batch(texts, lam: np.ndarray):
    """(n_grams int64[n], logw float64[n]): per-doc gram counts and
    importance weights sum(c_doc[b] * lam[b]).

    The float accumulation is np.bincount(doc_of_pos, weights=...) — a
    sequential left fold in position order per doc. NOT reduceat: its
    np.add.reduce segments sum PAIRWISE, and the tree shape depends on
    segment length, which differs for the last doc of a batch (the
    buffer ends 3 positions early) — that made scores depend on Arrow
    batch composition by 1-2 ulp."""
    from qamd_spark.ngram import _batch_buffers

    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    buf, offsets = _batch_buffers(texts)
    a = buf.astype(np.int64)
    if len(buf) < 4:
        return np.zeros(n, dtype=np.int64), np.zeros(n, dtype=np.float64)
    h = (
        a[:-3] * (31 * 31 * 31) + a[1:-2] * (31 * 31) + a[2:-1] * 31 + a[3:]
    ) & (DSIR_DIM - 1)
    valid = (
        (a[:-3] != _SEP) & (a[1:-2] != _SEP) & (a[2:-1] != _SEP) & (a[3:] != _SEP)
    )
    bounds = np.minimum(offsets, len(h))
    doc_of_pos = np.repeat(np.arange(n, dtype=np.int64), bounds[1:] - bounds[:-1])
    n_grams = np.bincount(doc_of_pos[valid], minlength=n).astype(np.int64)
    per_pos = np.where(valid, lam[h], 0.0)
    logw = np.bincount(doc_of_pos, weights=per_pos, minlength=n)
    return n_grams, logw


def default_target_counts() -> np.ndarray:
    """Bucket counts of the frozen in-repo target domain: the clean
    prose corpora (all languages) — the same positives the quality
    classifier trains on. Deterministic; computed driver-side."""
    from qamd_spark import corpora

    texts = [corpora.LANG_CORPORA[k] for k in sorted(corpora.LANG_CORPORA)]
    return dsir_corpus_counts(texts)


def dsir_lambda(raw_counts: np.ndarray, target_counts: np.ndarray) -> np.ndarray:
    """Per-bucket log-likelihood-ratio vector with +1 Laplace smoothing:
    lam[b] = log((T[b]+1)/(T_tot+DIM)) - log((R[b]+1)/(R_tot+DIM))."""
    t = target_counts.astype(np.float64)
    r = raw_counts.astype(np.float64)
    return (np.log(t + 1.0) - np.log(t.sum() + DSIR_DIM)) - (
        np.log(r + 1.0) - np.log(r.sum() + DSIR_DIM)
    )


def dsir_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_counts: np.ndarray | None = None,
    gumbel_salt: int | None = None,
) -> DataFrame:
    """Per-document DSIR importance weights over ``df``.

    Output: (id_col, n_grams, dsir_logw, selected) where selected =
    dsir_logw > 0 (more target-like than the raw-corpus average).
    With ``gumbel_salt`` set, an extra gumbel_key column
    (dsir_logw + deterministic SplitMix64 Gumbel noise) rides in the
    SAME scoring stage — dsir_resample uses it, so selection adds no
    second Python stage. Downstream, the weights also compose with
    token_budget_sample (order by -dsir_logw instead of the md5 key).

    Two scans: pass 1 aggregates the raw hashed-n-gram distribution to
    <= DSIR_DIM rows (partial counts per Arrow batch + one hash agg);
    pass 2 scores with the broadcast lambda vector. Both stages are
    whole-batch numpy — no per-row Python."""
    import pandas as pd

    spark = df.sparkSession
    tgt = default_target_counts() if target_counts is None else target_counts

    def _partial_counts(it):
        for pdf in it:
            c = dsir_corpus_counts(pdf[text_col].tolist())
            nz = np.flatnonzero(c)
            yield pd.DataFrame({"bucket": nz.astype(np.int64), "cnt": c[nz]})

    partials = df.select(text_col).mapInPandas(
        _partial_counts, schema="bucket long, cnt long"
    )
    agg = partials.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
    raw = np.zeros(DSIR_DIM, dtype=np.int64)
    for row in agg:
        raw[row["bucket"]] = row["cnt"]
    lam = dsir_lambda(raw, tgt)
    lam_bc = spark.sparkContext.broadcast(lam)
    with_gumbel = gumbel_salt is not None

    def _score(it):
        lv = lam_bc.value
        for pdf in it:
            n_grams, logw = dsir_score_batch(pdf[text_col].tolist(), lv)
            out = {
                "_id": pdf[id_col],
                "n_grams": n_grams,
                "dsir_logw": logw,
            }
            if with_gumbel:
                ids = pdf[id_col].to_numpy(dtype=np.int64)
                out["gumbel_key"] = logw + gumbel_keys(ids, gumbel_salt)
            yield pd.DataFrame(out)

    id_type = dict(df.dtypes)[id_col]
    schema = f"_id {id_type}, n_grams long, dsir_logw double"
    if with_gumbel:
        schema += ", gumbel_key double"
    scored = df.select(id_col, text_col).mapInPandas(_score, schema=schema)
    cols = [
        F.col("_id").alias(id_col),
        F.col("n_grams"),
        F.col("dsir_logw"),
        (F.col("dsir_logw") > 0.0).alias("selected"),
    ]
    if with_gumbel:
        cols.append(F.col("gumbel_key"))
    return scored.select(*cols)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public PRNG construction) over int64 ids —
    a pure-numpy uint64 bijection, bit-identical in every process."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def gumbel_keys(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic standard-Gumbel noise per id: u = splitmix64(id ^
    salted-constant) mapped to (0,1), g = -log(-log(u)). No RNG state —
    reproducible across runs, engines, and cluster sizes."""
    h = _splitmix64(ids.astype(np.int64) ^ np.int64(salt))
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u = np.maximum(u, 2.0**-53)  # avoid log(0)
    return -np.log(-np.log(u))


def dsir_resample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_counts: np.ndarray | None = None,
    salt: int = 0,
) -> DataFrame:
    """The DSIR selection step: keep k documents by Gumbel-top-k over
    the importance weights — equivalent to sampling WITHOUT replacement
    with probability proportional to exp(dsir_logw) (the Gumbel-max
    trick), but fully deterministic: the noise is a salted SplitMix64
    hash of the id, not an RNG. Output: the k selected
    (id, dsir_logw, gumbel_key) rows.

    Scale: the noise rides in the same Arrow stage as the scores (one
    Python stage total); the global top-k plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows), never a full sort."""
    id_dtype = dict(df.dtypes)[id_col]
    if id_dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        # the SplitMix64 noise is keyed on the integer id; failing here
        # beats a numpy cast error inside a task
        raise ValueError(
            f"dsir_resample requires an integer id column; {id_col!r} is "
            f"{id_dtype} (hash string keys to int64 first, e.g. xxhash64)"
        )
    if df.filter(F.col(id_col).isNull()).limit(1).count():
        # a NULL id reaches pandas as float64/NaN and the int64 cast
        # would mint an arbitrary-but-plausible Gumbel key that can
        # displace legitimate selections — fail loud at the driver
        # (one cheap limit-1 scan, the dedup-CLI precedent)
        raise ValueError(
            f"dsir_resample: id column {id_col!r} contains NULLs"
        )
    scored = dsir_weights(df, id_col, text_col, target_counts, gumbel_salt=salt)
    return (
        scored.select(id_col, "dsir_logw", "gumbel_key")
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(int(k))
    )


def dsir_resample_pdf(pdf, k, id_col="doc_id", text_col="text",
                      target_counts=None, salt: int = 0):
    """pandas twin of dsir_resample (same kernels, same noise)."""
    scored = dsir_weights_pdf(pdf, id_col, text_col, target_counts)
    ids = scored[id_col].to_numpy(dtype=np.int64)
    scored = scored.assign(
        gumbel_key=scored["dsir_logw"].to_numpy() + gumbel_keys(ids, salt)
    )
    out = scored.sort_values(
        ["gumbel_key", id_col], ascending=[False, True]
    ).head(k)
    return out[[id_col, "dsir_logw", "gumbel_key"]].reset_index(drop=True)


def dsir_weights_pdf(pdf, id_col="doc_id", text_col="text", target_counts=None):
    """Single-node pandas twin of dsir_weights — same kernels, same
    two-pass structure, bit-exact (per-doc bincount folds are
    batch-composition invariant)."""
    import pandas as pd

    tgt = default_target_counts() if target_counts is None else target_counts
    raw = dsir_corpus_counts(pdf[text_col].tolist())
    lam = dsir_lambda(raw, tgt)
    n_grams, logw = dsir_score_batch(pdf[text_col].tolist(), lam)
    return pd.DataFrame(
        {
            id_col: pdf[id_col].to_numpy(),
            "n_grams": n_grams,
            "dsir_logw": logw,
            "selected": logw > 0.0,
        }
    )


def mix_weights(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Domain-mixture reweighting (the Dolma / DoReMi-lite bookkeeping
    step): per group, the corpus's actual token share vs the target
    share, and the sampling multiplier target/actual that a mixing
    sampler applies. One hash aggregate + a broadcast of the single
    total row; shares are single divisions of exact integer sums and the
    multiplier is computed left-to-right as target * total / group_sum,
    so the DuckDB twin is bit-identical. Groups missing a target get
    weight 0 (dropped domains)."""
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.coalesce(F.col(weight_col).cast("long"), F.lit(0))).alias("w_sum"),
    )
    total = agg.groupBy().agg(
        F.sum("w_sum").alias("w_total"), F.sum("n_rows").alias("n_total")
    )
    tgt = F.lit(0.0)
    for k in sorted(targets):
        tgt = F.when(F.col("grp") == k, F.lit(float(targets[k]))).otherwise(tgt)
    j = agg.crossJoin(F.broadcast(total))
    return j.select(
        F.col("grp").alias(group_col),
        "n_rows",
        "w_sum",
        (F.col("w_sum").cast("double") / F.col("w_total").cast("double")).alias(
            "actual_share"
        ),
        tgt.alias("target_share"),
        (
            tgt * F.col("w_total").cast("double") / F.col("w_sum").cast("double")
        ).alias("mix_weight"),
    )
