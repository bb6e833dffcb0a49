"""PII / toxicity regex patterns and the scrub chain.

Mirrors the reference's regex-pattern disclosure check (QAMyData
ValueRegexPatterns, reference src/check/post.rs:354-391; seed patterns for
e-mail + UK mobile in reference default.yaml:148-152 and
src/bin/gen_config.rs:16-20) and extends it from detect-only to
detect-and-scrub (north_star).

One shared Python ``re`` engine is used by BOTH the Spark pipeline (inside
the Arrow-batched pandas scoring stage) and the single-node oracle, so the
scrubbed text is bit-identical on the two paths — the safest answer to the
"exact scrubbed-text equality" risk (SURVEY.md §7).

Patterns are applied in the declared order; order matters (SSN before
generic phone so ``123-45-6789`` is scrubbed as SSN, not phone).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# name -> (compiled pattern, replacement token). Declared application order.
PII_PATTERNS: list[tuple[str, re.Pattern, str]] = [
    (
        "email",
        # unanchored variant of the reference's e-mail seed regex
        # (default.yaml:150 anchors whole-value; we match within free text)
        re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
        "<EMAIL>",
    ),
    (
        "ssn",
        re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
        "<SSN>",
    ),
    (
        "uk_mobile",
        # reference default.yaml:151, unanchored
        re.compile(r"(?:\+44\s?7\d{3}|\(?07\d{3}\)?)\s?\d{3}\s?\d{3}"),
        "<PHONE>",
    ),
    (
        "us_phone",
        re.compile(r"(?<!\d)(?:\+?1[ .\-])?\(?\d{3}\)?[ .\-]\d{3}[ .\-]\d{4}(?!\d)"),
        "<PHONE>",
    ),
]

PII_NAMES = [name for name, _, _ in PII_PATTERNS]


def profanity_pattern(lexicon: list[str]) -> re.Pattern:
    """Word-boundary alternation over the toxicity lexicon (case-insensitive).

    The lexicon mechanism mirrors the reference's stopword dictionary check
    (src/check/post.rs:420-443) repurposed as a toxicity list (north_star).
    """
    alts = "|".join(re.escape(w) for w in sorted(lexicon))
    return re.compile(r"\b(?:" + alts + r")\b", re.IGNORECASE)


def scrub_series(
    text: pd.Series,
    pii_names: list[str] | None = None,
    profanity_rx: re.Pattern | None = None,
) -> tuple[pd.Series, pd.Series, np.ndarray]:
    """Scrub a batch of texts.

    Returns (scrubbed text Series, per-row list-of-hit-pattern-names Series,
    profanity_hit bool ndarray). Null texts stay null with no hits.
    Vectorized via pandas ``.str`` ops (Arrow-batch friendly).
    """
    active = [p for p in PII_PATTERNS if pii_names is None or p[0] in pii_names]
    notnull = text.notna()
    # single regex pass per pattern: subn does replace + hit-count at once
    # (a vectorized contains + replace would scan every string twice)
    values = text.tolist()
    hit_cols: list[np.ndarray] = []
    names: list[str] = []
    for name, rx, repl in active:
        sub = rx.subn
        hits = np.zeros(len(values), dtype=bool)
        for i, s in enumerate(values):
            if isinstance(s, str):
                values[i], k = sub(repl, s)
                if k:
                    hits[i] = True
        hit_cols.append(hits)
        names.append(name)
    prof_hit = np.zeros(len(text), dtype=bool)
    if profanity_rx is not None:
        sub = profanity_rx.subn
        for i, s in enumerate(values):
            if isinstance(s, str):
                values[i], k = sub("<PROFANITY>", s)
                if k:
                    prof_hit[i] = True
    scrubbed = pd.Series(values, index=text.index, dtype=object)
    if hit_cols:
        mat = np.column_stack(hit_cols)
        hit_lists = pd.Series(
            [[n for n, h in zip(names, row) if h] for row in mat], index=text.index
        )
    else:
        hit_lists = pd.Series([[] for _ in range(len(text))], index=text.index)
    scrubbed = scrubbed.where(notnull, None)
    return scrubbed, hit_lists, prof_hit
