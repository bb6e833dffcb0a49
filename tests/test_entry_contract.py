"""Mimics the driver's verify: run each queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables; compare row count,
column names, and (order-insensitively) exact values — floats included,
since every float is produced by an IEEE-identical expression on both sides.
"""

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_duckdb_oracle(spark, con, name):
    q = E.queries()[name]
    sp = _normalize(q(spark, SF).toPandas())
    dk = _normalize(con.sql(E.oracle_sql()[name]).df())
    assert list(sp.columns) == list(dk.columns), (sp.columns, dk.columns)
    assert len(sp) == len(dk)
    for c in sp.columns:
        a, b = sp[c].to_numpy(), dk[c].to_numpy()
        if np.issubdtype(sp[c].dtype, np.floating):
            assert np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True), c
        else:
            mism = [
                (x, y) for x, y in zip(a, b)
                if x != y and not (_isnan(x) and _isnan(y))
            ]
            assert not mism, (c, mism[:5])


def _isnan(v):
    try:
        return v is None or (isinstance(v, float) and math.isnan(v))
    except Exception:
        return False


def test_rows_only_queries_run(spark):
    # non-SQL-expressible entries: must run and return >= 0 rows, stable schema
    for name in sorted(set(E.queries()) - set(E.oracle_sql())):
        df = E.queries()[name](spark, SF)
        n = df.count()
        assert n >= 0
        assert len(df.columns) > 0


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_lang_agreement_composes_from_langid_docs(spark):
    """lang_agreement (rows-only) must equal the direct composition of
    the langid prediction with the declared lang column — cell counts
    sum to the corpus size and match a pandas groupby of the same join."""
    import pandas as pd

    got = (
        E.queries()["lang_agreement"](spark, SF)
        .toPandas()
        .sort_values(["decl_lang", "pred_lang"])
        .reset_index(drop=True)
    )
    pred = E.queries()["langid_docs"](spark, SF).toPandas()[["doc_id", "lang"]]
    pred["doc_id"] = pred["doc_id"].astype("int64")  # langid_docs emits string ids
    decl = spark.read.parquet(f"{SF}/documents.parquet").toPandas()[
        ["doc_id", "lang"]
    ]
    want = (
        pred.merge(decl, on="doc_id", suffixes=("_pred", "_decl"))
        .groupby(["lang_decl", "lang_pred"])
        .size()
        .reset_index(name="n")
        .sort_values(["lang_decl", "lang_pred"])
        .reset_index(drop=True)
    )
    assert got["n"].sum() == len(decl)
    assert len(got) == len(want)
    assert (got["decl_lang"].to_numpy() == want["lang_decl"].to_numpy()).all()
    assert (got["pred_lang"].to_numpy() == want["lang_pred"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert (
        got["agree"].to_numpy()
        == (got["decl_lang"] == got["pred_lang"]).to_numpy()
    ).all()


def test_neardup_by_source_composes_from_minhash_pairs(spark):
    """neardup_by_source (rows-only) must equal the pandas composition of
    the bit-exact-pinned minhash pair set with the doc→source map."""
    from qamd_spark.ops import dedup as dd

    got = {
        (r["dup_source"], r["keep_source"]): r["n_pairs"]
        for r in E.queries()["neardup_by_source"](spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dd.minhash_duplicates(docs).toPandas()
    src = docs.select("doc_id", "source").toPandas().set_index("doc_id")["source"]
    want = {}
    for d, k in zip(pairs["doc_id"], pairs["dup_of"]):
        key = (src[d], src[k])
        want[key] = want.get(key, 0) + 1
    assert got == want and sum(got.values()) == len(pairs)
