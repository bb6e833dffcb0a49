import numpy as np

from qamd_spark import ngram


def test_langid_basic():
    texts = [
        "the quick brown fox jumps over the lazy dog and the river flows",
        "les enfants marchent vers l'école en parlant des jeux de la pluie",
        "der zug verlässt den bahnhof um sieben und kommt in der stadt an",
        "los niños caminan hacia la escuela hablando de los juegos",
    ]
    langs, margin, ppl = ngram.score_texts(texts)
    assert list(langs) == ["en", "fr", "de", "es"]
    assert (margin > 0.5).all()


def test_empty_and_null():
    langs, margin, ppl = ngram.score_texts(["", None, "ab"])
    assert list(langs) == [ngram.UND] * 3
    assert (ppl == ngram.PPL_EMPTY).all()
    assert (margin == 0.0).all()


def test_gibberish_low_margin():
    langs, margin, ppl = ngram.score_texts(["xq zvk pqw jjj qqq zzz vvv kkk"])
    assert margin[0] < 0.15  # below default langid min_margin → 'und'
    assert ppl[0] > 30000  # above default perplexity max


def test_english_perplexity_below_bound():
    _, _, ppl = ngram.score_texts(
        ["we measured the results carefully and wrote every number down"]
    )
    assert ppl[0] < 30000


def test_determinism_and_batch_independence():
    texts = ["the cat sat", "le chat", "", "der hund lief schnell davon", None]
    a = ngram.score_texts(texts)
    b = ngram.score_texts(texts)
    for x, y in zip(a, b):
        assert (x == y).all()
    # scoring one-at-a-time must equal scoring as a batch (no cross-doc bleed)
    for i, t in enumerate(texts):
        l1, m1, p1 = ngram.score_texts([t])
        assert l1[0] == a[0][i]
        assert m1[0] == a[1][i]
        assert p1[0] == a[2][i]


def test_single_empty_batch():
    langs, margin, ppl = ngram.score_texts([""])
    assert langs[0] == ngram.UND


def test_empty_input():
    langs, margin, ppl = ngram.score_texts([])
    assert len(langs) == 0
