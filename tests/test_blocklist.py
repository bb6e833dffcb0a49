"""Tests for rules/blocklist.py (token-boundary phrase matching) and the
dangling_tools pairing audit's planted-damage semantics."""

import pytest
from pyspark.sql import functions as F

from qamd_spark.rules import blocklist as bl


def _hits(spark, rows, phrases):
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = bl.phrase_hits(spark, df, "text", phrases).collect()
    panel = sorted(set(phrases))
    return [(r["doc_id"], panel[r["rank"]]) for r in out]


def test_phrase_hit_on_token_boundary(spark):
    got = _hits(spark, [(1, "please buy now before midnight")], ["buy now"])
    assert got == [(1, "buy now")]


def test_no_partial_token_false_positive(spark):
    # a substring/contains panel WOULD fire on "buy nowhere" — the
    # n-gram equi-join must not (tokens are ["buy","nowhere"])
    got = _hits(spark, [(1, "you can buy nowhere else")], ["buy now"])
    assert got == []


def test_counts_every_positional_occurrence(spark):
    got = _hits(spark, [(1, "buy now and buy now again")], ["buy now"])
    assert got == [(1, "buy now"), (1, "buy now")]


def test_mixed_lengths_and_case(spark):
    rows = [(1, "All Rights Reserved."), (2, "lorem ipsum dolor sit amet")]
    phrases = ["all rights reserved.", "lorem ipsum dolor sit"]
    got = sorted(_hits(spark, rows, phrases))
    assert got == [(1, "all rights reserved."), (2, "lorem ipsum dolor sit")]


def test_empty_and_null_text(spark):
    got = _hits(spark, [(1, ""), (2, None)], ["buy now"])
    assert got == []


def test_rank_is_sorted_panel_index(spark):
    # rank must index sorted(panel) regardless of panel declaration order
    got = bl.phrase_hits(
        spark,
        spark.createDataFrame(
            [(1, "act fast buy now")], schema="doc_id long, text string"
        ),
        "text",
        ["buy now", "act fast"],  # unsorted on purpose
    ).collect()
    by_rank = sorted((r["rank"], r["doc_id"]) for r in got)
    assert by_rank == [(0, 1), (1, 1)]  # act fast=0, buy now=1


def test_default_panel_lengths_bounded():
    lens = {len(p.split()) for p in bl.DEFAULT_BLOCKLIST_PHRASES}
    assert lens and max(lens) <= 4 and min(lens) >= 2


def test_phrase_hits_is_broadcast_join(spark):
    df = spark.createDataFrame([(1, "buy now")], schema="doc_id long, text string")
    plan = bl.phrase_hits(spark, df, "text", ["buy now"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.fixture(scope="module")
def dangling(spark, tmp_path_factory):
    """Run q_dangling_tools over a tiny synthetic documents table."""
    import __spark_entry__ as entry

    d = tmp_path_factory.mktemp("dt")
    n = 97 * 8  # 8 full turns per conversation
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s0").alias("source"),
        F.lit(1).cast("long").alias("n_chars"),
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    rows = entry.q_dangling_tools(spark, str(d)).collect()
    return {r["conv"]: r.asDict() for r in rows}


def test_dangling_planted_damage(dangling):
    # doc_id 0: idx 0 role user (13|0 but base!=tool_result -> unchanged).
    # doc_id 13: conv 13, idx 0 -> base user, unchanged.
    # doc_id 97*2+conv with (idx%4==2) are tool_result turns; damage fires
    # where doc_id%13==0. Find one: doc_id = 97*2 + c with doc_id%13==0
    # -> 194+c ≡ 0 (mod 13) -> c ≡ -194 ≡ 1 (mod 13) -> c=1: doc 195.
    # conv 1 therefore lost its idx-2 tool_result: its idx-1 call dangles.
    assert dangling[1]["n_dangling"] >= 1
    assert not dangling[1]["clean"]


def test_dangling_orphan_damage(dangling):
    # tool_call turns are idx%4==1 -> doc_id = 97+c; orphan damage where
    # doc_id%17==0 -> 97+c ≡ 0 (mod 17) -> c ≡ -97 ≡ 5 (mod 17) -> c=5.
    # conv 5's idx-1 tool_call became user: its idx-2 result is orphaned.
    assert dangling[5]["n_orphaned"] >= 1
    assert not dangling[5]["clean"]


def test_undamaged_conversations_clean(dangling):
    # a conv with neither damage residue: must have all calls answered
    damaged = set()
    for doc_id in range(97 * 8):
        idx, conv = divmod(doc_id, 97)
        if idx % 4 == 2 and doc_id % 13 == 0:
            damaged.add(conv)
        if idx % 4 == 1 and doc_id % 17 == 0:
            damaged.add(conv)
    clean = [c for c in range(97) if c not in damaged]
    assert clean, "fixture must leave some conversations undamaged"
    for c in clean:
        r = dangling[c]
        assert r["clean"] and r["n_dangling"] == 0 and r["n_orphaned"] == 0
        assert r["n_calls"] == 2 and r["n_results"] == 2  # 8 turns = 2 loops
