"""Distributed BPE training/encoding (qamd_spark/ops/bpe.py) vs the
pure-Python twin: the learned merge list must be bit-identical, and the
rank-greedy encoder must equal replaying the merge list in order."""

import pandas as pd
import pytest

from qamd_spark.ops import bpe

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _wc_pdf(path=DOCS):
    texts = pd.read_parquet(path, columns=["text"])["text"]
    wc: dict[str, int] = {}
    for t in texts:
        for w in bpe._py_words(t):  # the shared training/encoding tokenizer
            wc[w] = wc.get(w, 0) + 1
    return wc


def _replay(word: str, merges) -> list[str]:
    syms = list(word)
    for a, b, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_train_matches_python_twin_exactly(spark):
    df = spark.read.parquet(DOCS)
    got = bpe.train_bpe(df, num_merges=25)
    want = bpe.train_bpe_py(_wc_pdf(), num_merges=25)
    assert got == want
    # merges are well-formed and counts non-increasing is NOT guaranteed
    # by BPE (a merge can create a more frequent pair), but every count
    # must respect the floor
    assert all(n >= 2 for _, _, n in got)
    assert len(got) == 25  # corpus is repetitive enough to yield all 25


def test_word_counts_matches_pandas(spark):
    got = {
        r["word"]: r["cnt"]
        for r in bpe.word_counts(spark.read.parquet(DOCS)).collect()
    }
    assert got == _wc_pdf()


def test_encoder_equals_merge_replay():
    wc = _wc_pdf()
    merges = bpe.train_bpe_py(wc, num_merges=40)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w in list(wc)[:200]:
        enc = bpe.encode_word(w, ranks)
        assert enc == _replay(w, merges), w
        assert "".join(enc) == w  # lossless


def test_bpe_encode_dataframe(spark):
    df = spark.read.parquet(DOCS).limit(50)
    merges = bpe.train_bpe_py(_wc_pdf(), num_merges=20)
    out = bpe.bpe_encode(df, merges).select("doc_id", "text", "bpe_tokens")
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for r in out.collect():
        want = []
        for w in bpe._py_words(r["text"]):
            want.extend(bpe.encode_word(w, ranks))
        assert list(r["bpe_tokens"]) == want
        assert "".join(r["bpe_tokens"]) == "".join(bpe._py_words(r["text"]))


def test_early_stop_on_min_pair_count():
    merges = bpe.train_bpe_py({"ab": 1, "cd": 1}, num_merges=10, min_pair_count=2)
    assert merges == []


def test_tie_break_is_lexicographic():
    # 'zz' and 'aa' both occur 3 times -> 'a','a' must win (pair asc)
    merges = bpe.train_bpe_py({"zz": 3, "aa": 3}, num_merges=1)
    assert merges[0][:2] == ("a", "a")


@pytest.mark.parametrize("word", ["aaaa", "abab", "banana"])
def test_greedy_leftmost_nonoverlapping(spark, word):
    # spark fold application == python twin application on overlap traps
    df = spark.createDataFrame([(word,)], "text string")
    got = bpe.train_bpe(df, num_merges=3, min_pair_count=1)
    want = bpe.train_bpe_py({word: 1}, num_merges=3, min_pair_count=1)
    assert got == want


def test_bpe_cli_train_and_encode(spark, tmp_path):
    """main.py bpe: train writes the merges JSON (equal to the twin),
    encode round-trips it onto the corpus."""
    import contextlib
    import io as _io
    import json

    from qamd_spark import main as qmain

    mjson = str(tmp_path / "merges.json")
    out = str(tmp_path / "enc")
    with contextlib.redirect_stdout(_io.StringIO()) as s:
        rc = qmain.main(["bpe", "--input", DOCS, "--output", mjson,
                         "--merges", "15"])
    assert rc == 0 and json.loads(s.getvalue())["n_merges"] == 15
    got = [tuple(m) for m in json.load(open(mjson))["merges"]]
    assert got == bpe.train_bpe_py(_wc_pdf(), num_merges=15)

    with contextlib.redirect_stdout(_io.StringIO()) as s:
        rc = qmain.main(["bpe", "--mode", "encode", "--input", DOCS,
                         "--merges-file", mjson, "--output", out])
    assert rc == 0
    enc = spark.read.parquet(out)
    assert "bpe_tokens" in enc.columns
    ranks = {(a, b): i for i, (a, b, _) in enumerate(got)}
    r = enc.orderBy("doc_id").limit(1).collect()[0]
    want = []
    for w in (r["text"] or "").lower().strip().split():
        want.extend(bpe.encode_word(w, ranks))
    assert list(r["bpe_tokens"]) == want


# ---------------------------------------------------------------- unigram LM
from qamd_spark.ops import unigram as ug  # noqa: E402


def test_unigram_train_matches_python_twin_exactly(spark):
    """The Spark-trained unigram vocabulary (counts AND log-probs) must
    be bit-identical to the pure-Python twin over the same histogram —
    the two paths share viterbi/logp/prune, so equality is exact."""
    df = spark.read.parquet(DOCS)
    got = ug.train_unigram(df, vocab_size=120, seed_size=400, iters=2)
    want = ug.train_unigram_py(_wc_pdf(), vocab_size=120, seed_size=400, iters=2)
    assert got == want
    assert all(c > 0 for _, c, _ in got)
    # output order is the documented (count desc, piece asc) total order
    assert got == sorted(got, key=lambda r: (-r[1], r[0]))


def test_unigram_train_partitioning_invariant(spark):
    """Repartitioning the corpus must not change the trained pieces
    (integer counts + deterministic tie-breaks everywhere)."""
    df = spark.read.parquet(DOCS)
    a = ug.train_unigram(df, vocab_size=100, seed_size=300, iters=2)
    b = ug.train_unigram(
        df.repartition(13), vocab_size=100, seed_size=300, iters=2
    )
    assert a == b


def test_unigram_captures_planted_pattern(spark):
    """A corpus dominated by one repeated multi-char pattern must learn
    that pattern as a top piece (the point of the unigram LM: frequent
    substrings beat characters)."""
    rows = [("abcabcabc zz",)] * 50 + [("qq abcabc",)] * 10
    df = spark.createDataFrame(rows, "text string")
    pieces = ug.train_unigram(df, vocab_size=40, seed_size=200, iters=2)
    vocab = {p for p, _, _ in pieces}
    assert "abcabc" in vocab or "abc" in vocab
    top = pieces[0][0]
    assert len(top) > 1  # a multi-char piece wins, not a character


def test_unigram_viterbi_properties():
    """Viterbi: concatenation restores the word; unsegmentable words
    pass through whole; longer-piece tie-break is deterministic."""
    lp = ug._logp_from_counts({"ab": 4, "a": 2, "b": 2, "abab": 4})
    assert "".join(ug.viterbi_segment("ababab", lp, 6)) == "ababab"
    assert ug.viterbi_segment("xyz", lp, 6) == ["xyz"]  # unsegmentable
    # 'abab' as one piece beats 'ab'+'ab' (P(abab) > P(ab)^2)
    assert ug.viterbi_segment("abab", lp, 6) == ["abab"]


def test_unigram_encode_dataframe(spark):
    """unigram_encode: per-row tokens equal the Python-side Viterbi of
    each word, concatenated in order."""
    df = spark.read.parquet(DOCS)
    pieces = ug.train_unigram(df, vocab_size=80, seed_size=300, iters=2)
    enc = ug.unigram_encode(df.limit(5), pieces)
    lp = {p: l for p, _, l in pieces}
    for r in enc.collect():
        want = []
        for w in bpe._py_words(r["text"]):
            want.extend(ug.viterbi_segment(w, lp, 6))
        assert list(r["unigram_tokens"]) == want
