"""Mixed-script confusable (homoglyph) word detection.

A single WORD mixing Latin letters with Cyrillic or Greek ones is the
IDN-homograph spoof signature (Unicode TR#39 confusable detection):
'pаypаl' with Cyrillic а U+0430 renders identically to the Latin word
but evades every string-equality filter, blocklist, and dedup key — the
standard trick for smuggling phishing/abuse text past curation.
Doc-level script histograms (ops/text.script_profile) cannot express
this: a document may legitimately mix two languages, but one word mixing
two scripts is near-certainly adversarial. Reference analogue:
StringValueOddCharacters (reference src/check/value.rs — a per-value
character-class scan) upgraded to a per-word cross-script predicate.

Exactness across engines: Java regex spells script classes
``\\p{IsCyrillic}``, RE2/DuckDB ``\\p{Cyrillic}``, and Python ``re`` has
no property classes at all — so the rule is defined over EXPLICIT
code-point ranges (basic Latin letters, the Cyrillic block
U+0400-U+04FF, the Greek block U+0370-U+03FF) that all three engines
interpret identically. That is narrower than full Unicode script
classes and is exactly the confusable surface that matters (the TR#39
confusables table for Latin targets is dominated by these two blocks).

The Spark side is a higher-order filter over split words (pure JVM,
whole-stage codegen, no explode); the pandas twin uses one combined
regex per word via lookaheads.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LATIN = "A-Za-z"
CONFUSABLE = "\\u0370-\\u03FF\\u0400-\\u04FF"  # Greek + Cyrillic blocks

_LATIN_RX = f"[{LATIN}]"
_CONF_RX = f"[{CONFUSABLE}]"
# one word containing both classes, either order (pandas/python re)
_WORD_RX = f"(?:{_LATIN_RX}[^ ]*{_CONF_RX}|{_CONF_RX}[^ ]*{_LATIN_RX})"


def mixed_word_count(text: Column) -> Column:
    """Number of whitespace-split words mixing Latin with
    Cyrillic/Greek letters. NULL-safe (NULL text => 0)."""
    words = F.filter(
        F.split(F.coalesce(text, F.lit("")), " "), lambda x: x != ""
    )
    mixed = F.filter(
        words, lambda w: w.rlike(_LATIN_RX) & w.rlike(_CONF_RX)
    )
    return F.size(mixed).cast("long")


def homoglyph_hit(text: Column) -> Column:
    """TRUE when any word mixes Latin with Cyrillic/Greek letters."""
    return mixed_word_count(text) > 0


def homoglyph_hit_pdf(text_series):
    """pandas twin of homoglyph_hit — exact: a word matches iff it
    contains at least one char of each class, which the alternation
    regex expresses without lookaheads (both orders enumerated)."""
    return text_series.fillna("").str.contains(_WORD_RX, regex=True)
