"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Fully seeded (no wall-clock, no unseeded randomness): the same
(seed, n_convs) always produces bit-identical tables, so oracle labels and
scrubbed text are reproducible across runs and parallelism levels.

Plants one positive + negative population per rule, mirroring how the
reference's fixture Context plants one failure mode per variable
(reference src/check/post.rs:459-598), plus one "hot" conversation at
~100x the median turn count to exercise the skew/salting path.
"""

from __future__ import annotations

import datetime as dt
import random

import numpy as np
import pandas as pd

from qamd_spark import corpora

_EN_SENTENCES = [s.strip().replace("\n", " ") for s in corpora.EN.split(".") if s.strip()]
_FR_SENTENCES = [s.strip().replace("\n", " ") for s in corpora.FR.split(".") if s.strip()]
_DE_SENTENCES = [s.strip().replace("\n", " ") for s in corpora.DE.split(".") if s.strip()]
_ES_SENTENCES = [s.strip().replace("\n", " ") for s in corpora.ES.split(".") if s.strip()]

_PII_TEMPLATES = [
    "you can reach me at {name}.{surname}@example.org if needed",
    "my number is +44 7700 900{d3} call after five",
    "the ssn on file is {d3}-{d2}-{d4} please verify",
    "call the office at (555) 867-{d4} tomorrow morning",
    "email {name}{d2}@mail-site.com and cc {surname}@dept.example.co.uk",
]

_NAMES = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]
_SURNAMES = ["smith", "jones", "brown", "taylor", "wilson", "davies"]

_GIBBERISH_TOKENS = [
    "xq", "zvk", "pqw", "qzx", "vrrk", "zzj", "kqv", "xxw", "jzq", "wvx",
]

_ODD_SNIPPETS = ["weird## t&xt", "@@@ broken *** row", "odd  spacing # here & there"]

_BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)

_ROLES_CYCLE = ["user", "assistant", "user", "assistant", "system", "tool"]


def _sentence(rng: random.Random, pool: list[str], k: int = 2) -> str:
    return ". ".join(rng.choice(pool) for _ in range(k)) + "."


def _pii_text(rng: random.Random) -> str:
    t = rng.choice(_PII_TEMPLATES)
    return t.format(
        name=rng.choice(_NAMES),
        surname=rng.choice(_SURNAMES),
        d2=f"{rng.randrange(100):02d}"[:2],
        d3=f"{rng.randrange(1000):03d}",
        d4=f"{rng.randrange(10000):04d}",
    )


def generate(
    n_convs: int = 200,
    seed: int = 42,
    hot_conv_turns: int = 400,
    missing_conv_every: int = 11,
) -> pd.DataFrame:
    """Generate the transcript table as pandas (write with pyarrow/Spark).

    ~60% plain English turns; the rest planted features. Conversation
    ``conv{i:05d}``; every ``missing_conv_every``-th conversation is >25%
    empty turns (trips conv_missing_fraction); conv 0 is the hot one.
    """
    rng = random.Random(seed)
    rows: list[tuple] = []
    dup_pool = [
        "please confirm the order number and the delivery date.",
        "thanks that answers my question completely.",
        "the report is attached for your review.",
    ]
    for ci in range(n_convs):
        conv_id = f"conv{ci:05d}"
        n_turns = hot_conv_turns if ci == 0 else rng.randint(4, 16)
        missing_conv = ci % missing_conv_every == 3
        for ti in range(n_turns):
            role = _ROLES_CYCLE[ti % len(_ROLES_CYCLE)]
            tool = "search" if role == "tool" else None
            r = rng.random()
            if missing_conv and rng.random() < 0.45:
                text = "" if rng.random() < 0.5 else None
            elif r < 0.58:
                text = _sentence(rng, _EN_SENTENCES, rng.randint(1, 3))
            elif r < 0.63:
                text = rng.choice(dup_pool)  # exact duplicates across convs
            elif r < 0.67:
                text = _pii_text(rng)
            elif r < 0.70:
                text = _sentence(rng, _EN_SENTENCES, 1) + " " + rng.choice(
                    corpora.PROFANITY
                ) + " indeed."
            elif r < 0.73:
                text = rng.choice(_ODD_SNIPPETS) + " " + "&#" * rng.randint(2, 6)
            elif r < 0.76:
                lang_pool = rng.choice([_FR_SENTENCES, _DE_SENTENCES, _ES_SENTENCES])
                text = _sentence(rng, lang_pool, rng.randint(1, 2))
            elif r < 0.79:
                text = " ".join(rng.choice(_GIBBERISH_TOKENS) for _ in range(8))
            elif r < 0.82:
                word = rng.choice(["ha", "no", "yes", "ok"])
                text = " ".join([word] * rng.randint(20, 60))  # repetition
            elif r < 0.85:
                text = " ".join(
                    rng.choice(corpora.STOPWORDS) for _ in range(rng.randint(3, 8))
                )  # all stopwords
            elif r < 0.865:
                text = rng.choice(["x", "k", "?", "!!", "9"])  # too short
            elif r < 0.88:
                text = rng.choice(["N/A", " -9 ", "null", "...", "NA"])  # sentinels
            elif r < 0.91:
                text = _sentence(rng, _EN_SENTENCES, 40)  # very long-ish
            elif r < 0.94:
                # rare one-off signature (unique gibberish token)
                text = f"token-{rng.randrange(10**9):09d} appears once only"
            else:
                # mixed-case punctuated stopword-ish (tokenizer exactness)
                text = "The  And Of! " + _sentence(rng, _EN_SENTENCES, 1)
            ts = _BASE_TS + dt.timedelta(minutes=ci * 7 + ti)
            if ci % 13 == 5 and ti == 2:
                # planted time regression (ts_regression rule): this turn's
                # ts lands before turn 1's
                ts -= dt.timedelta(minutes=5)
            rows.append((conv_id, ti, role, text, tool, ts))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype(np.int32)
    return pdf


def write_parquet(
    path: str, n_convs: int = 200, seed: int = 42, row_group_rows: int = 100_000, **kw
) -> str:
    """Write with bounded row groups so Spark's byte-range file splitting
    yields real scan parallelism (one giant row group = one effective task
    no matter what maxPartitionBytes says)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate(n_convs=n_convs, seed=seed, **kw)
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string(), nullable=False),
            pa.field("turn_idx", pa.int32(), nullable=False),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, path, row_group_size=row_group_rows)
    return path
