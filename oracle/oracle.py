"""Single-node pure-pandas oracle — defines the reference labels.

Re-implements the full pipeline semantics (qamd_spark/pipeline.py) on one
pandas DataFrame. Per-turn scoring is literally the SAME function
(qamd_spark.turnscore.score_pdf), so scores and scrubbed text are
bit-identical by construction; the cross-row stages (dedup keep-first,
global occurrence counts, per-conversation empty fraction) are independent
pandas re-implementations whose agreement with the Spark agg/join plan is
what the F1 gate actually tests (FIXTURES.md §4 comparison contract:
sort by (conv_id, turn_idx); keep/drop F1 >= 0.99; scrubbed_text exact).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from qamd_spark import turnscore
from qamd_spark.config import QamdConfig


def _is_empty(text: pd.Series) -> pd.Series:
    return text.isna() | (text == "")


def label_pdf(pdf: pd.DataFrame, cfg: QamdConfig | None = None) -> pd.DataFrame:
    cfg = cfg or QamdConfig()
    s = cfg.settings
    out = turnscore.score_pdf(pdf.reset_index(drop=True), cfg)
    text = out["text"]
    empty = _is_empty(text)
    nonempty = ~empty

    # cross-row stats (the Spark agg+join analogues)
    ne = out[nonempty.to_numpy()]
    grp = ne.groupby("text", sort=False)
    occ = grp["conv_id"].transform("size")
    text_occ = pd.Series(np.zeros(len(out), dtype=np.int64), index=out.index)
    text_occ[nonempty] = occ.astype(np.int64)
    # keep-first under (conv_id, turn_idx): min of the tuple per text group
    keys = list(zip(ne["conv_id"], ne["turn_idx"]))
    first = (
        pd.DataFrame({"text": ne["text"].to_numpy(), "key": keys})
        .groupby("text", sort=False)["key"]
        .transform("min")
    )
    is_first = pd.Series(np.ones(len(out), dtype=bool), index=out.index)
    is_first[nonempty] = [k == f for k, f in zip(keys, first)]

    conv_cnt = out.groupby("conv_id")["turn_idx"].transform("size").astype(np.int64)
    conv_empty = (
        empty.astype(np.int64).groupby(out["conv_id"]).transform("sum").astype(np.int64)
    )

    conds: list[tuple[str, pd.Series]] = []

    def add(name: str, series) -> None:
        if cfg.enabled(name):
            conds.append((name, pd.Series(series, index=out.index).fillna(False).astype(bool)))

    if cfg.enabled("bad_conv_id"):
        rx = re.compile(s["bad_conv_id"])
        add("bad_conv_id", ~out["conv_id"].map(lambda c: bool(rx.search(c or ""))))
    if cfg.enabled("role_vocabulary"):
        add("role_vocabulary", out["role"].isna() | ~out["role"].isin(s["role_vocabulary"]))
    add("empty_turn", empty)
    if cfg.enabled("sentinel_text"):
        # strip(' ') not strip(): Spark F.trim removes 0x20 only
        add("sentinel_text", text.str.strip(" ").isin(s["sentinel_text"]))
    if cfg.enabled("length_bounds"):
        b = s["length_bounds"]
        add("length_bounds", (out["n_chars"] < int(b["min"])) | (out["n_chars"] > int(b["max"])))
    if cfg.enabled("odd_characters"):
        hit = pd.Series(np.zeros(len(out), dtype=bool), index=out.index)
        for ch in s["odd_characters"]:
            hit |= text.str.contains(re.escape(ch), regex=True, na=False)
        add("odd_characters", nonempty & hit)
    if cfg.enabled("odd_char_ratio"):
        add("odd_char_ratio", out["odd_char_ratio"] > float(s["odd_char_ratio"]))
    if cfg.enabled("repetition"):
        r = s["repetition"]
        add(
            "repetition",
            (out["repetition_ratio"] > float(r["max"]))
            & (out["n_tokens"] >= int(r["min_tokens"])),
        )
    if cfg.enabled("oov_fraction"):
        add(
            "oov_fraction",
            nonempty & (out["oov_fraction"] > float(s["oov_fraction"]["max"])),
        )
    if cfg.enabled("duplicate_turn"):
        add("duplicate_turn", nonempty & ~is_first)
    if cfg.enabled("conv_missing_fraction"):
        thr = float(s["conv_missing_fraction"])
        pct = conv_empty.astype(np.float64) / conv_cnt.astype(np.float64) * 100.0
        add("conv_missing_fraction", pct > thr)
    add("pii", out["pii_hits"].map(len) > 0)
    add("profanity", out["profanity_hit"])
    add("all_stopwords", out["all_stopwords"])
    if cfg.enabled("stopword_fraction"):
        add("stopword_fraction", out["stopword_fraction"] > float(s["stopword_fraction"]))
    if cfg.enabled("rare_signature"):
        add("rare_signature", nonempty & (text_occ <= int(s["rare_signature"])))
    if cfg.enabled("custom_regex"):
        hit = pd.Series(np.zeros(len(out), dtype=bool), index=out.index)
        for p in s["custom_regex"]:
            hit |= text.str.contains(p, regex=True, na=False)
        add("custom_regex", hit)
    if cfg.enabled("langid"):
        add("langid", ~out["lang"].isin(s["langid"]["allowed"]))
    if cfg.enabled("perplexity"):
        add("perplexity", out["perplexity"] > float(s["perplexity"]["max"]))

    name_order = [n for n, _ in conds]
    mat = (
        np.column_stack([c.to_numpy() for _, c in conds])
        if conds
        else np.zeros((len(out), 0), dtype=bool)
    )
    out["rule_hits"] = [
        [n for n, h in zip(name_order, row) if h] for row in mat
    ]
    drop_names = set(cfg.drop_rules())
    drop_idx = [i for i, n in enumerate(name_order) if n in drop_names]
    out["keep"] = ~mat[:, drop_idx].any(axis=1) if drop_idx else True
    return out


def summary_pdf(labeled: pd.DataFrame, cfg: QamdConfig | None = None) -> pd.DataFrame:
    """Per-rule pass/fail counts in registry order (Status analogue,
    reference src/report/mod.rs:126-132; uniform pass = total - fail,
    documented deviation per SURVEY.md §2.3)."""
    cfg = cfg or QamdConfig()
    total = len(labeled)
    hits = labeled["rule_hits"]
    rows = []
    for spec in cfg.enabled_rules():
        fail = int(hits.map(lambda h: spec.name in h).sum())
        rows.append(
            (spec.name, spec.category, cfg.action(spec.name), spec.desc, total - fail, fail)
        )
    return pd.DataFrame(
        rows, columns=["rule", "category", "action", "desc", "pass", "fail"]
    )
