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


def test_credit_card_scrub_is_luhn_gated():
    """Valid card numbers scrub to <CARD>; checksum failures, too-short
    and too-long digit runs stay untouched — in BOTH engine paths."""
    texts = [
        "pay 4111 1111 1111 1111 today",      # valid, spaced
        "pay 4111111111111111 today",         # valid, bare
        "amex 378282246310005 works",         # valid, 15 digits
        "bad 4111-1111-1111-1112 stays",      # checksum off by one
        "order 123456789012 is fine",         # 12 digits: too short
        "serial 12345678901234567890 kept",   # 20 digits: too long
        None,
        "card 5500 0000 0000 0004 and mail a@b.org",
    ]
    s, hits, _ = _scrub(texts, ["credit_card", "email"])
    assert s[0] == "pay <CARD> today" and hits[0] == ["credit_card"]
    assert s[1] == "pay <CARD> today"
    assert s[2] == "amex <CARD> works"
    assert s[3] == texts[3] and hits[3] == []
    assert s[4] == texts[4] and s[5] == texts[5]
    assert s[6] is None
    assert s[7] == "card <CARD> and mail <EMAIL>"
    assert sorted(hits[7]) == ["credit_card", "email"]
    # megastring path == rowwise path on validator-bearing batches
    ser = pd.Series(texts)
    passes = [p for p in pii.PII_PATTERNS if p[0] in ("credit_card", "email")]
    vals = ["" if not isinstance(t, str) else t for t in texts]
    exp_s, exp_h, _ = pii._scrub_series_rowwise(ser, vals, passes, ser.notna())
    got_s, got_h, _ = pii.scrub_series(ser, ["credit_card", "email"])
    assert list(exp_s) == list(got_s)
    assert [sorted(a) for a in exp_h] == [sorted(b) for b in got_h]


def test_credit_card_default_config_unchanged():
    """credit_card is NOT in the default config's pii list: the default
    pipeline never scrubs cards until a user opts in."""
    from qamd_spark.config import QamdConfig

    cfg = QamdConfig()
    assert "credit_card" not in cfg.pii_pattern_names
    s, hits, _ = _scrub(["pay 4111 1111 1111 1111 now"], cfg.pii_pattern_names)
    assert s == ["pay 4111 1111 1111 1111 now"] and hits == [[]]


def test_credit_card_pipeline_oracle_parity(spark, tmp_path):
    """With credit_card enabled in the config, the Spark pipeline's
    scrubbed text / hits equal the pandas oracle bit-for-bit (shared
    engine), and the validated scrub actually fires on valid cards."""
    import numpy as np
    from oracle import oracle
    from qamd_spark import pipeline
    from qamd_spark.config import DEFAULT_SETTINGS, QamdConfig

    rows = []
    texts = [
        "please charge 4111 1111 1111 1111 for the monthly invoice total",
        "the reference number 4111-1111-1111-1112 is not a real card here",
        "ship to alice@example.org and bill card 378282246310005 thanks",
        "a perfectly ordinary sentence with enough words to pass checks",
        "order id 123456789012 plus phone 415 555 1234 in one message",
    ]
    for i, t in enumerate(texts):
        rows.append(
            {"conv_id": f"c{i % 2}", "turn_idx": np.int32(i), "role": "user",
             "text": t, "tool": None,
             "ts": pd.Timestamp("2025-01-01") + pd.Timedelta(minutes=i)}
        )
    pdf = pd.DataFrame(rows)
    for c in ("conv_id", "role", "text", "tool"):
        pdf[c] = pdf[c].astype("string")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    p = str(tmp_path / "cards.parquet")
    pdf.to_parquet(p)

    settings = dict(DEFAULT_SETTINGS)
    settings["pii"] = ["email", "ssn", "uk_mobile", "us_phone", "credit_card"]
    cfg = QamdConfig(settings=settings)
    sp = (
        pipeline.label(spark.read.parquet(p).repartition(3), cfg)
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    orc = (
        oracle.label_pdf(pdf, cfg)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert (sp["scrubbed_text"].to_numpy() == orc["scrubbed_text"].to_numpy()).all()
    assert (sp["keep"].to_numpy() == orc["keep"].to_numpy()).all()
    joined = "\n".join(sp["scrubbed_text"].tolist())
    assert "<CARD>" in joined
    assert "4111-1111-1111-1112" in joined  # invalid checksum untouched
    assert "<EMAIL>" in joined and "<PHONE>" in joined


def test_ip_scrub_octet_bounded():
    """Valid IPv4 scrubs to <IP> in both engine paths; out-of-range
    octets, 4-digit groups, and version-like strings stay untouched;
    default config never scrubs IPs (opt-in like credit_card)."""
    texts = [
        "connect to 192.168.1.1 now",
        "edge 255.255.255.255 and 0.0.0.0 both",
        "not an ip 256.1.1.1 here",
        "not an ip 10.20.30.4000 either",
        "version 1.2.3 stays",
        None,
        "host 10.0.0.7, mail a@b.org",
    ]
    s, hits, _ = _scrub(texts, ["email", "ip_address"])
    assert s[0] == "connect to <IP> now" and hits[0] == ["ip_address"]
    assert s[1] == "edge <IP> and <IP> both"
    assert s[2] == texts[2] and hits[2] == []
    assert s[3] == texts[3]
    assert s[4] == texts[4]
    assert s[5] is None
    assert s[6] == "host <IP>, mail <EMAIL>"
    assert sorted(hits[6]) == ["email", "ip_address"]
    ser = pd.Series(texts)
    passes = [p for p in pii.PII_PATTERNS if p[0] in ("email", "ip_address")]
    vals = ["" if not isinstance(t, str) else t for t in texts]
    exp_s, exp_h, _ = pii._scrub_series_rowwise(ser, vals, passes, ser.notna())
    got_s, got_h, _ = pii.scrub_series(ser, ["email", "ip_address"])
    assert list(exp_s) == list(got_s)
    from qamd_spark.config import QamdConfig

    cfg = QamdConfig()
    assert "ip_address" not in cfg.pii_pattern_names
    s0, h0, _ = _scrub(["ping 10.0.0.1"], cfg.pii_pattern_names)
    assert s0 == ["ping 10.0.0.1"] and h0 == [[]]


def test_ip_rule_pipeline_oracle_parity(spark, tmp_path):
    """Enabling ip_address in the pii list: Spark pipeline output equals
    the pandas oracle byte-for-byte (shared scrub engine)."""
    import numpy as np

    from oracle import oracle
    from qamd_spark import pipeline
    from qamd_spark.config import QamdConfig

    rows = [
        ("ip0", 0, "server at 203.0.113.9 responded quickly today indeed"),
        ("ip0", 1, "clean text with no addresses in it at all right now"),
        ("ip0", 2, "bad host 999.1.2.3 is not a valid address anyway"),
    ]
    pdf = pd.DataFrame(
        [
            {"conv_id": c, "turn_idx": np.int32(i), "role": "user",
             "text": t, "tool": None, "ts": pd.NaT}
            for c, i, t in rows
        ]
    )
    p = str(tmp_path / "ip.parquet")
    pdf2 = pdf.copy()
    pdf2["ts"] = pd.to_datetime(pdf2["ts"]).astype("datetime64[us]")
    for c in ("conv_id", "role", "text", "tool"):
        pdf2[c] = pdf2[c].astype("string")
    pdf2.to_parquet(p)
    cfg = QamdConfig()
    cfg.settings["pii"] = ["email", "ssn", "uk_mobile", "us_phone",
                           "ip_address"]
    sp = (
        pipeline.label(spark.read.parquet(p), cfg)
        .toPandas().sort_values("turn_idx").reset_index(drop=True)
    )
    orc = oracle.label_pdf(pdf, cfg).sort_values("turn_idx").reset_index(drop=True)
    assert sp["scrubbed_text"][0] == orc["scrubbed_text"][0]
    assert "<IP>" in sp["scrubbed_text"][0]
    assert sp["scrubbed_text"][2] == rows[2][2]  # invalid octet untouched
    assert (sp["keep"].to_numpy() == orc["keep"].to_numpy(dtype=bool)).all()
    for x, y in zip(sp["rule_hits"], orc["rule_hits"]):
        assert list(x) == list(y)
