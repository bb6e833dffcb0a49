"""Tests for ops/cdc.py (content-defined chunking): bit-exact equality
with the sequential pandas twin, batch-composition independence, the
insertion-robustness property that motivates CDC over fixed chunking,
and the min/max boundary contract."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from oracle import oracle
from qamd_spark.ops import cdc

SF = "/root/testdata/sf0.001"
COLS = ["doc_id", "pos", "chunk_hash", "chunk_len"]


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _sorted(df):
    return df[COLS].sort_values(COLS).reset_index(drop=True)


def _long_text(n_words=800):
    return " ".join(
        hashlib.md5(str(i).encode()).hexdigest()[:5] for i in range(n_words)
    )


def test_spark_matches_sequential_twin(spark, docs_pdf):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    got = _sorted(cdc.cdc_chunk_rows(df).toPandas())
    want = _sorted(oracle.cdc_chunks_pdf(docs_pdf))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_batch_composition_independence(docs_pdf):
    # chunking a doc alone must equal chunking it packed mid-batch —
    # the invariant the per-shift offset mask exists for
    texts = list(docs_pdf["text"].iloc[:10])
    ridx, pos, ch, cl = cdc._cdc_batch(texts)
    solo_r, solo_p, solo_h, solo_l = cdc._cdc_batch([texts[7]])
    m = ridx == 7
    assert list(ch[m]) == list(solo_h) and list(pos[m]) == list(solo_p)


def test_chunks_tile_document_exactly(docs_pdf):
    ridx, pos, ch, cl = cdc._cdc_batch(list(docs_pdf["text"].iloc[:20]))
    for d in range(20):
        m = ridx == d
        n = len(docs_pdf["text"].iloc[d].encode("utf-8"))
        assert cl[m].sum() == n
        # contiguous, non-overlapping: next pos == prev pos + len
        assert (pos[m][1:] == pos[m][:-1] + cl[m][:-1]).all()


def test_min_max_bounds(docs_pdf):
    ridx, pos, ch, cl = cdc._cdc_batch(list(docs_pdf["text"]))
    assert cl.max() <= cdc.CDC_MAX_SIZE
    # every chunk except a document's final one honors min_size
    last = np.r_[ridx[1:] != ridx[:-1], True]
    assert cl[~last].min() >= cdc.CDC_MIN_SIZE


def test_insertion_robustness_vs_fixed_offset():
    t = _long_text()
    one = pd.DataFrame({"doc_id": [0], "text": [t]})
    two = pd.DataFrame({"doc_id": [0], "text": [t[:37] + "INSERTED" + t[37:]]})
    r1 = oracle.cdc_chunks_pdf(one)
    r2 = oracle.cdc_chunks_pdf(two)
    shared = len(set(r1.chunk_hash) & set(r2.chunk_hash))
    assert shared >= 0.9 * len(r1)  # boundaries resync after the edit

    def fixed(b, sz=64):
        return {hashlib.md5(b[i : i + sz]).digest() for i in range(0, len(b), sz)}

    f1 = fixed(t.encode())
    f2 = fixed((t[:37] + "INSERTED" + t[37:]).encode())
    assert len(f1 & f2) == 0  # the failure mode CDC exists to avoid


def test_empty_and_null_text():
    ridx, pos, ch, cl = cdc._cdc_batch(["", None, "x" * 40])
    assert set(ridx) == {2} and cl.sum() == 40


def test_invalid_params_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc.cdc_chunk_rows(df, min_size=0)
    with pytest.raises(ValueError):
        cdc.cdc_chunk_rows(df, min_size=300, max_size=256)
    with pytest.raises(ValueError):
        cdc.cdc_chunk_rows(df, avg_bits=0)
