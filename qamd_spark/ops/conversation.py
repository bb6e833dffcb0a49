"""Conversation-level grouped features via applyInPandas (grouped map).

The per-turn pipeline is deliberately narrow (mapInPandas pass-through);
some audit features need the WHOLE conversation in turn order — role
alternation, per-conversation empty ratio, distinct-role counts. Those are
the natural fit for ``groupBy(conv_id).applyInPandas``: Spark shuffles
each conversation to one task, the function sees the full ordered group.

Scale notes: groups are conversations (≤ thousands of turns), so group
state is bounded; a hot conversation is one task but cheap (pure numpy
over one group). The shuffle is the operator's cost — at 10^12 turns run
it on the conv_id-bucketed table (io.write_bucketed_table) so the groupBy
needs no Exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CONV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("n_roles", T.IntegerType()),
        T.StructField("alternation_ratio", T.DoubleType()),
        T.StructField("empty_ratio", T.DoubleType()),
    ]
)


def conv_features(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One row per conversation: turn count, distinct roles, fraction of
    consecutive turn pairs that switch roles (0.0 for single-turn convs),
    empty-turn fraction. All ratios are exact small-int divisions, so the
    SQL window-lag twin matches bit-for-bit. NULL-role semantics follow
    SQL (`role <> lag(role)` is NULL when either side is NULL): a
    transition to or from a NULL role is NOT counted as a switch, while
    the denominator stays n-1 — cross-engine consistent with the DuckDB
    window-lag twin, including when roles contain NULLs (pinned by
    tests/test_ops.py)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(turn_col)
        n = len(pdf)
        roles = pdf[role_col].to_numpy(dtype=object)
        text = pdf[text_col]
        nn = pd.notna(roles)
        switches = (
            int(((roles[1:] != roles[:-1]) & nn[1:] & nn[:-1]).sum())
            if n > 1
            else 0
        )
        return pd.DataFrame(
            {
                "conv_id": [pdf[conv_col].iloc[0]],
                "n_turns": np.int32(n),
                # distinct NON-NULL roles (matches SQL COUNT(DISTINCT ...))
                "n_roles": np.int32(pd.unique(roles[pd.notna(roles)]).size),
                "alternation_ratio": float(switches) / (n - 1) if n > 1 else 0.0,
                "empty_ratio": float((text.isna() | (text == "")).sum()) / n,
            }
        )

    return (
        df.select(conv_col, turn_col, role_col, text_col)
        .groupBy(conv_col)
        .applyInPandas(fn, schema=CONV_FEATURES_SCHEMA)
    )


def conv_verdicts(
    labeled: DataFrame,
    min_keep_fraction: float = 0.5,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Conversation-level verdict from per-turn labels: a conversation
    survives iff at least ``min_keep_fraction`` of its turns were kept
    (the conversation-granularity drop policy layered on the per-turn
    pipeline). One partial-aggregated pass over the labeled table;
    boundary uses exact integer comparison (n_keep * 1 >= frac * n) to
    stay engine-exact."""
    from pyspark.sql import functions as F

    agg = labeled.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
    )
    # integer-exact threshold: keep iff n_keep >= ceil(frac * n) without
    # float division (n_keep * 10^9 >= frac * 10^9 * n, all integral)
    scale = 1_000_000_000
    thr = int(round(min_keep_fraction * scale))
    return agg.select(
        conv_col,
        "n_turns",
        "n_keep",
        (F.col("n_keep") * scale >= F.lit(thr) * F.col("n_turns")).alias("conv_keep"),
    )
