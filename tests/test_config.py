import pytest

from qamd_spark import config as C


def test_default_config_valid():
    cfg = C.QamdConfig()
    assert cfg.enabled("pii")
    assert "duplicate_turn" in cfg.drop_rules()
    assert "rare_signature" not in cfg.drop_rules()  # flag-only
    assert "pii" not in cfg.drop_rules()  # scrub, not drop


def test_registry_order_fixed():
    names = [r.name for r in C.RULE_REGISTRY]
    assert names[0] == "bad_conv_id"
    assert names.index("duplicate_turn") < names.index("pii")


def test_absent_rule_skipped():
    cfg = C.QamdConfig(settings={**C.DEFAULT_SETTINGS, "langid": None})
    assert not cfg.enabled("langid")
    assert "langid" not in [r.name for r in cfg.enabled_rules()]


@pytest.mark.parametrize(
    "name,bad",
    [
        ("conv_missing_fraction", 0),
        ("conv_missing_fraction", 101),
        ("odd_char_ratio", 0.0),
        ("odd_char_ratio", 1.5),
        ("rare_signature", 0),
        ("odd_characters", []),
        ("bad_conv_id", "[unclosed"),
        ("length_bounds", {"min": 10, "max": 5}),
    ],
)
def test_validation_bounds(name, bad):
    # bounds mirrored from reference src/config.rs:90-246
    with pytest.raises(C.ConfigError):
        C.QamdConfig(settings={**C.DEFAULT_SETTINGS, name: bad})


def test_action_override():
    cfg = C.QamdConfig(actions={"pii": "drop"})
    assert "pii" in cfg.drop_rules()
    with pytest.raises(C.ConfigError):
        C.QamdConfig(actions={"pii": "explode"})


def test_yaml_roundtrip():
    yaml_doc = """
data_integrity:
  length_bounds:
    setting: {min: 1, max: 100}
    desc: "len"
  duplicate_turn:
    setting: true
    desc: "dups"
disclosure_risk:
  pii:
    setting: [email, ssn]
    desc: "pii"
    action: drop
engine:
  n_buckets: 16
"""
    cfg = C.from_yaml(yaml_doc)
    # YAML-absent rules are disabled (reference optional-setting semantics)
    assert not cfg.enabled("langid")
    assert cfg.enabled("length_bounds")
    assert cfg.action("pii") == "drop"
    assert cfg.n_buckets == 16


def test_yaml_wrong_section_rejected():
    with pytest.raises(C.ConfigError):
        C.from_yaml("metadata:\n  pii:\n    setting: [email]\n")


def test_quality_classifier_config():
    """YAML round-trip + validation bounds for the trained-model rule."""
    import pytest as _pytest

    from qamd_spark import config as C

    cfg = C.from_yaml(
        """
quality:
  quality_classifier:
    setting: {min_score: 0.4}
    desc: "Trained quality score should not fall below the threshold"
"""
    )
    assert cfg.enabled("quality_classifier")
    assert cfg.action("quality_classifier") == "drop"
    _w, _b, thr = cfg.ensure_qc_model()
    assert thr == 0.4  # explicit min_score overrides the calibrated value
    # null min_score => calibrated threshold from the trained model
    cfg2 = C.QamdConfig()
    cfg2.settings["quality_classifier"] = {"min_score": None}
    _w2, _b2, thr2 = cfg2.ensure_qc_model()
    assert 0.0 < thr2 < 1.0 and thr2 != 0.4
    # bounds
    with _pytest.raises(C.ConfigError):
        C.QamdConfig(settings={**C.DEFAULT_SETTINGS,
                               "quality_classifier": {"min_score": 1.5}})
    with _pytest.raises(C.ConfigError):
        C.QamdConfig(settings={**C.DEFAULT_SETTINGS,
                               "quality_classifier": "yes"})


def test_compression_rejects_unknown_keys():
    import pytest

    from qamd_spark.config import ConfigError, QamdConfig

    cfg = QamdConfig()
    cfg.settings["compression"] = {"max_ration": 2.0}  # typo
    with pytest.raises(ConfigError, match="unknown keys"):
        cfg.validate()


def test_dictionary_from_file_resolution(tmp_path):
    """Reference dictionary-from-file parity (src/check/dictionary.rs:
    46-56, default.yaml dictionary settings; fixtures test/words.txt,
    test/stopwords.txt): vocab / stopwords / profanity accept
    {file: path} or {files: [paths]} and resolve to the stitched
    newline-split word list at config build."""
    words = tmp_path / "words.txt"
    words.write_text("alpha\nbeta\n\n  gamma  \n")
    words2 = tmp_path / "words2.txt"
    words2.write_text("delta\n")
    stops = tmp_path / "stopwords.txt"
    stops.write_text("the\na\nan\n")
    tox = tmp_path / "tox.txt"
    tox.write_text("fraktz\nblorgak\n")
    yaml_doc = f"""
data_integrity:
  oov_fraction:
    setting: {{vocab: {{files: [{words}, {words2}]}}, max: 0.5}}
    desc: "oov"
disclosure_risk:
  profanity:
    setting: {{file: {tox}}}
    desc: "tox"
engine:
  stopwords: {{file: {stops}}}
"""
    cfg = C.from_yaml(yaml_doc)
    assert cfg.settings["oov_fraction"]["vocab"] == ["alpha", "beta", "gamma", "delta"]
    assert cfg.settings["profanity"] == ["fraktz", "blorgak"]
    assert cfg.stopwords == ["the", "a", "an"]
    assert cfg.vocab_set == frozenset({"alpha", "beta", "gamma", "delta"})
    # direct-construction path resolves too
    cfg2 = C.QamdConfig(
        settings={
            **dict(C.DEFAULT_SETTINGS),
            "oov_fraction": {"vocab": {"file": str(words)}, "max": 0.4},
        },
        stopwords={"file": str(stops)},
    )
    assert cfg2.settings["oov_fraction"]["vocab"] == ["alpha", "beta", "gamma"]
    assert cfg2.stopwords == ["the", "a", "an"]


def test_dictionary_file_errors(tmp_path):
    import pytest as _pt

    missing = tmp_path / "nope.txt"
    with _pt.raises(C.ConfigError, match="cannot read"):
        C.QamdConfig(
            settings={
                **dict(C.DEFAULT_SETTINGS),
                "profanity": {"file": str(missing)},
            }
        )
    empty = tmp_path / "empty.txt"
    empty.write_text("\n\n")
    with _pt.raises(C.ConfigError, match="no words"):
        C.QamdConfig(
            settings={
                **dict(C.DEFAULT_SETTINGS),
                "profanity": {"file": str(empty)},
            }
        )
    with _pt.raises(C.ConfigError, match="unknown file-spec"):
        C.QamdConfig(
            settings={
                **dict(C.DEFAULT_SETTINGS),
                "profanity": {"file": str(empty), "mode": "x"},
            }
        )
    # {'files': []} with no 'file' fallback is a malformed spec, not a
    # bare KeyError (ADVICE r4)
    with _pt.raises(C.ConfigError, match="non-empty 'files' list"):
        C.QamdConfig(
            settings={
                **dict(C.DEFAULT_SETTINGS),
                "profanity": {"files": []},
            }
        )


def test_dictionary_file_edit_invalidates_checkpoint_fingerprint(tmp_path):
    """Editing a dictionary file changes config_fingerprint (the content
    is resolved INTO settings before hashing), so resume manifests from
    the old dictionary are invalidated — r3 VERDICT item 7's checkpoint
    half."""
    from qamd_spark.checkpoint import config_fingerprint

    vocab = tmp_path / "v.txt"
    vocab.write_text("alpha\nbeta\n")

    def build():
        return C.QamdConfig(
            settings={
                **dict(C.DEFAULT_SETTINGS),
                "oov_fraction": {"vocab": {"file": str(vocab)}, "max": 0.5},
            }
        )

    fp1 = config_fingerprint(build())
    assert fp1 == config_fingerprint(build())  # stable while unchanged
    vocab.write_text("alpha\nbeta\ngamma\n")
    assert config_fingerprint(build()) != fp1
