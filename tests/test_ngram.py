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
    # margins shrink as the language set grows (es/pt/it are close); they
    # must still clear the default langid gating threshold of 0.15
    assert (margin > 0.15).all()


# Held-out evaluation snippets: fresh prose per language, NOT drawn from
# the training corpora in qamd_spark/corpora.py.
HELD_OUT = {
    "en": [
        "she parked the car near the market and bought apples for the week",
        "our team finished the report early and went outside for lunch",
        "the winter storm closed the airport for nearly two days",
    ],
    "fr": [
        "il a laissé son parapluie dans le bus et il pleut encore ce soir",
        "nous avons visité le musée avant de prendre le déjeuner ensemble",
        "la réunion de jeudi est reportée à la semaine prochaine",
    ],
    "de": [
        "sie hat den schlüssel im büro vergessen und musste zurückfahren",
        "am wochenende wandern wir gern durch den wald hinter dem dorf",
        "das neue fahrrad steht seit gestern im keller neben der tür",
    ],
    "es": [
        "olvidó las llaves en la oficina y tuvo que volver por ellas",
        "el próximo viernes celebramos el cumpleaños de mi hermana en casa",
        "el mercado abre temprano y conviene llegar antes de las ocho",
    ],
    "it": [
        "ha dimenticato le chiavi in ufficio ed è dovuto tornare indietro",
        "sabato andiamo al mare se il tempo resta bello tutto il giorno",
        "il negozio chiude presto quindi conviene arrivare prima di sera",
    ],
    "pt": [
        "ele esqueceu as chaves no escritório e precisou voltar para buscá-las",
        "no domingo vamos à praia se o tempo continuar firme o dia todo",
        "o mercado abre cedo e vale a pena chegar antes das oito",
    ],
    "nl": [
        "hij vergat zijn sleutels op kantoor en moest terugrijden om ze te halen",
        "zaterdag fietsen we naar het strand als het weer goed blijft",
        "de winkel sluit vroeg dus het is slim om voor de avond te komen",
    ],
    "sv": [
        "hon glömde nycklarna på kontoret och fick åka tillbaka efter dem",
        "på lördag cyklar vi till stranden om vädret håller i sig",
        "affären stänger tidigt så det är klokt att komma före kvällen",
    ],
    "pl": [
        "zapomniała kluczy w biurze i musiała po nie wrócić wieczorem",
        "w sobotę jedziemy nad jezioro jeśli pogoda się utrzyma",
        "sklep zamyka się wcześnie więc warto przyjść przed wieczorem",
    ],
    "fi": [
        "hän unohti avaimet toimistoon ja joutui palaamaan hakemaan ne",
        "lauantaina pyöräilemme rannalle jos sää pysyy hyvänä koko päivän",
        "kauppa sulkeutuu aikaisin joten kannattaa tulla ennen iltaa",
    ],
    "tr": [
        "anahtarları ofiste unuttu ve onları almak için geri dönmek zorunda kaldı",
        "hava güzel kalırsa cumartesi günü sahile bisikletle gideceğiz",
        "dükkan erken kapanıyor bu yüzden akşamdan önce gelmek akıllıca",
    ],
    "id": [
        "dia lupa kuncinya di kantor dan harus kembali untuk mengambilnya",
        "hari sabtu kami bersepeda ke pantai kalau cuacanya tetap cerah",
        "toko tutup lebih awal jadi sebaiknya datang sebelum malam",
    ],
    "zh": [
        "她把钥匙忘在办公室里，只好傍晚再回去取一趟",
        "要是周末天气晴朗，我们就骑车去海边玩一整天",
        "商店关门很早，最好在天黑之前赶过去买东西",
    ],
    "ja": [
        "かぎを会社に忘れてしまったので、夕方また取りに戻った",
        "天気がよければ土曜日に自転車で海まで出かけるつもりだ",
        "店が早く閉まるから、暗くなる前に行ったほうがいい",
    ],
    "ko": [
        "열쇠를 사무실에 두고 와서 저녁에 다시 가지러 가야 했다",
        "날씨가 좋으면 토요일에 자전거를 타고 바다에 갈 것이다",
        "가게가 일찍 닫으니까 어두워지기 전에 가는 게 좋다",
    ],
    "ru": [
        "она забыла ключи в офисе и вечером пришлось за ними вернуться",
        "если погода будет хорошей мы поедем в субботу на озеро",
        "магазин закрывается рано поэтому лучше прийти до вечера",
    ],
    "ar": [
        "نسيت المفاتيح في المكتب واضطرت إلى العودة من أجلها في المساء",
        "إذا بقي الطقس جميلا سنذهب يوم السبت إلى الشاطئ بالدراجات",
        "يغلق المتجر مبكرا لذلك من الأفضل الحضور قبل المساء",
    ],
}


def test_langid_confusion_matrix_on_held_out():
    """Per-language accuracy on held-out snippets (r2 VERDICT item 5):
    every language in the 8-language set must classify its own held-out
    prose correctly — the full confusion matrix is diagonal."""
    confusion = {}
    for true_lang, snippets in HELD_OUT.items():
        langs, margin, _ = ngram.score_texts(snippets)
        for pred in langs:
            confusion[(true_lang, pred)] = confusion.get((true_lang, pred), 0) + 1
    errors = {k: v for k, v in confusion.items() if k[0] != k[1]}
    assert not errors, errors
    # and every language is actually exercised
    assert {k[0] for k in confusion} == set(ngram.LANGS)


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


def test_score_texts_batch_composition_invariant():
    """Langid margins and perplexity must be bit-identical whether a doc
    is scored alone, mid-batch, or last-in-batch — the property that
    keeps Spark (Arrow batches) and the oracle (whole-column chunks)
    structurally in sync. Long docs matter: numpy's pairwise summation
    only kicks in past ~128 terms, so short fixtures cannot catch a
    segment-length-dependent tree (the pre-fix bug: the batch's final
    doc summed over a 2-shorter segment)."""
    import numpy as np

    from qamd_spark import corpora

    words = corpora.LANG_CORPORA["en"].split()
    long_docs = [" ".join(words[i % 60 : i % 60 + 80]) for i in range(9)]
    texts = long_docs + ["", None, "short text here"] + long_docs[::-1]
    whole_l, whole_m, whole_p = ngram.score_texts(texts)
    for cut in (1, 5, 9, 12, len(texts) - 1):
        a = ngram.score_texts(texts[:cut])
        b = ngram.score_texts(texts[cut:])
        assert list(whole_l) == list(a[0]) + list(b[0])
        assert np.array_equal(whole_m, np.concatenate([a[1], b[1]]))
        assert np.array_equal(whole_p, np.concatenate([a[2], b[2]]))
