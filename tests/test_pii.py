import pandas as pd

from qamd_spark.rules import pii


def _scrub(texts, names=None, prof=None):
    s, hits, ph = pii.scrub_series(pd.Series(texts), names, prof)
    return list(s), list(hits), list(ph)


def test_email_scrub():
    s, hits, _ = _scrub(["mail me at a.b@x.org please"])
    assert s == ["mail me at <EMAIL> please"]
    assert hits == [["email"]]


def test_ssn_before_phone():
    # SSN-shaped number must scrub as SSN, not phone (declared order)
    s, hits, _ = _scrub(["ssn 123-45-6789 on file"])
    assert s == ["ssn <SSN> on file"]
    assert hits == [["ssn"]]


def test_uk_mobile():
    # seed regex from reference default.yaml:151
    s, hits, _ = _scrub(["call +44 7700 900123 now", "or 07700 900456 later"])
    assert s == ["call <PHONE> now", "or <PHONE> later"]
    assert hits == [["uk_mobile"], ["uk_mobile"]]


def test_us_phone():
    s, hits, _ = _scrub(["office: (555) 867-5309 ext 2"])
    assert s == ["office: <PHONE> ext 2"]
    assert hits == [["us_phone"]]


def test_multiple_hits_ordered():
    s, hits, _ = _scrub(["a@b.co and 123-45-6789"])
    assert s == ["<EMAIL> and <SSN>"]
    assert hits == [["email", "ssn"]]


def test_null_passthrough():
    s, hits, ph = _scrub([None, "clean text"])
    assert s[0] is None and s[1] == "clean text"
    assert hits == [[], []]


def test_profanity():
    rx = pii.profanity_pattern(["fraktz", "blorgak"])
    s, hits, ph = _scrub(["what a Fraktz day", "fine day"], None, rx)
    assert s == ["what a <PROFANITY> day", "fine day"]
    assert ph == [True, False]


def test_profanity_word_boundary():
    rx = pii.profanity_pattern(["fraktz"])
    s, _, ph = _scrub(["fraktzish is fine"], None, rx)
    assert s == ["fraktzish is fine"]
    assert ph == [False]


def test_plain_digits_not_phone():
    # 10 digits without separators must NOT match us_phone
    s, hits, _ = _scrub(["order 5558675309 confirmed"])
    assert hits == [[]]
    assert s == ["order 5558675309 confirmed"]


def test_megastring_equals_rowwise():
    """The megastring fast path must be character-identical to sequential
    per-row subn, including hit attribution — adversarial boundary cases:
    PII at row edges (would bridge rows if the \\x00 separator were
    matchable), empty rows, nulls, adjacent hits."""
    rx = pii.profanity_pattern(["fraktz"])
    texts = [
        "a.b@x.org",                       # entire row is one match
        "123-45-6789",                      # ditto at both edges
        "",                                 # empty row between matches
        None,
        "x@y.co123-45-6789 tail",           # adjacent overlapping candidates
        "ends with a@b.io",                 # match at row end
        "(555) 867-5309 starts",            # match at row start
        "+44 7700 900123",                  # uk mobile whole-row
        "fraktz",                           # profanity whole-row
        "plain text no hits at all",
        "two a@b.co c@d.co emails",
    ]
    s = pd.Series(texts)
    notnull = s.notna()
    vals = ["" if not isinstance(t, str) else t for t in texts]
    passes = list(pii.PII_PATTERNS) + [("__profanity__", rx, "<PROFANITY>")]
    exp_s, exp_h, exp_p = pii._scrub_series_rowwise(s, list(vals), passes, notnull)
    got_s, got_h, got_p = pii.scrub_series(s, None, rx)
    assert list(got_s) == list(exp_s)
    assert list(got_h) == list(exp_h)
    assert list(got_p) == list(exp_p)


def test_megastring_equals_rowwise_on_synth_corpus():
    # the fast path must equal sequential per-row subn on a realistic
    # planted corpus (PII templates, profanity, accents, nulls, empties)
    from qamd_spark import synth
    from qamd_spark.config import QamdConfig

    cfg = QamdConfig()
    s = synth.generate(n_convs=300, seed=7, hot_conv_turns=10)["text"]
    vals = ["" if not isinstance(t, str) else t for t in s.tolist()]
    passes = list(pii.PII_PATTERNS) + [("__profanity__", cfg.profanity_rx, "<PROFANITY>")]
    exp_s, exp_h, exp_p = pii._scrub_series_rowwise(s, list(vals), passes, s.notna())
    got_s, got_h, got_p = pii.scrub_series(s, None, cfg.profanity_rx)
    assert list(got_s) == list(exp_s)
    assert list(got_h) == list(exp_h)
    assert list(got_p) == list(exp_p)


def test_nul_in_text_falls_back():
    # a NUL inside a row must not fragment row attribution
    s, hits, _ = _scrub(["pre\x00a@b.co post", "clean"])
    assert s == ["pre\x00<EMAIL> post", "clean"]
    assert hits == [["email"], []]
