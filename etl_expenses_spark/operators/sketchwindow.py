"""Sliding-window reads over mergeable per-period sketch relations.

One implementation shared by the batch query (`hll_sliding_7d_users`) and
the streaming state reader (`hll_read_sliding_users`) — their stream ==
batch equality is pinned in tests, so the window semantics must live in
exactly one place. The input is a (day, sk) relation — tiny by
construction (one KB-row per period regardless of event volume) — and
the window is a range self-join + register-max union over ≤window_days
sketch rows per output day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_hll_estimates(
    daily: DataFrame,
    window_days: int,
    day_col: str = "day",
    sk_col: str = "sk",
    out_col: str = "est_window_users",
) -> DataFrame:
    """(day, sketch) → (day, estimate over the trailing window). The
    BroadcastNestedLoopJoin this plans to is the intended shape: both
    sides are the per-day relation (≤365 rows/year)."""
    a, b = daily.alias("a"), daily.alias("b")
    return (
        a.join(
            b,
            (F.col(f"b.{day_col}") >= F.date_sub(F.col(f"a.{day_col}"), window_days - 1))
            & (F.col(f"b.{day_col}") <= F.col(f"a.{day_col}")),
        )
        .groupBy(F.col(f"a.{day_col}").alias(day_col))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col(f"b.{sk_col}"))).alias(
                out_col
            )
        )
    )
