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
