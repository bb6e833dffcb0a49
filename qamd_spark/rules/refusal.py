"""Canned-response / refusal-template detection for assistant turns.

Instruction-tuning corpora distilled from chat logs are routinely
cleaned of boilerplate refusals and self-referential disclaimers
("as an AI language model ...") before training — the public ShareGPT /
OpenOrca-style cleaning scripts all carry a phrase blocklist for this.
This module is the transcript-axis analogue of the reference's
StringValueStopword lexicon check (reference src/check/post.rs:229-268:
a configurable word blocklist over string values): here the lexicon is
a PHRASE panel and the scope is assistant turns only — a refusal in a
user turn is quotation, not model boilerplate.

Detection is pure-JVM ``contains`` over a lowercased copy (substring,
not regex), so the DuckDB / pandas twins are trivially exact and the
whole panel stays inside whole-stage codegen. The panel is a config
setting (list of phrases); ``True`` selects DEFAULT_REFUSAL_PHRASES.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Public-knowledge template markers (lowercase; matched as substrings).
# Ordered: the scan reports the FIRST matching phrase by panel order.
DEFAULT_REFUSAL_PHRASES: tuple[str, ...] = (
    "as an ai language model",
    "as an ai assistant",
    "i cannot assist with",
    "i can't assist with",
    "i cannot help with",
    "i'm sorry, but i cannot",
    "i am sorry, but i cannot",
    "i'm unable to provide",
    "i am unable to provide",
    "i do not have personal opinions",
    "my knowledge cutoff",
    "my training data only goes",
    "i'm just an ai",
)


def resolve_panel(setting) -> list[str]:
    """Config value -> phrase list (True => default panel)."""
    if setting is True:
        return list(DEFAULT_REFUSAL_PHRASES)
    return [str(p).lower() for p in setting]


def refusal_hit(text: Column, phrases: list[str] | None = None) -> Column:
    """TRUE when lower(text) contains any panel phrase. NULL-safe
    (NULL text => FALSE)."""
    low = F.lower(F.coalesce(text, F.lit("")))
    hit = None
    for p in phrases or DEFAULT_REFUSAL_PHRASES:
        e = low.contains(F.lit(p))
        hit = e if hit is None else (hit | e)
    return hit if hit is not None else F.lit(False)


def refusal_hit_pdf(text_series, phrases: list[str] | None = None):
    """pandas twin of refusal_hit (exact: same lowercase + substring)."""
    import numpy as np
    import pandas as pd

    low = text_series.fillna("").str.lower()
    hit = pd.Series(np.zeros(len(text_series), dtype=bool), index=text_series.index)
    for p in phrases or DEFAULT_REFUSAL_PHRASES:
        hit |= low.str.contains(p, regex=False)
    return hit
