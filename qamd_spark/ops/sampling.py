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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
