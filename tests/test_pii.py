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
