"""Bounded-interval (range) join via time bucketing.

The naive plan for ``r.ts IN (l.ts - W, l.ts]`` is a non-equi join, which
Spark executes as BroadcastNestedLoopJoin / cartesian — O(|L|·|R|) and a
cluster-killer at 100 TB. The scale-safe pattern: quantize both sides into
W-second buckets, explode the probe side to the two buckets its window can
touch, equi-join on (key, bucket) — a plain shuffled hash join — then apply
the exact range predicate to the candidate pairs. Each candidate pair is
produced exactly once because the build side keeps its single true bucket.

Shuffle cost is that of an ordinary equi join on (key, bucket); skew is
bounded by per-key density inside one window width. This is the batch twin
of a stream-stream interval join (Structured Streaming uses the same
state-bucketing idea internally).

Reference tie-in: the reference's "recent activity" shapes (e.g. incremental
extraction windows, `/root/reference/extract_data_pdf/lambda_function.py:104-105`
— "events in the last week") generalize to exactly this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_pairs(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    window_s: int,
) -> DataFrame:
    """Inner-join candidate pairs where ``right_ts ∈ (left_ts − window, left_ts]``
    and the key columns match.

    Column names of ``left`` and ``right`` must be disjoint (rename before
    calling). Bucket width = window width, so the probe side explodes to
    exactly 2 buckets regardless of window size.
    """
    w_us = int(window_s) * 1_000_000
    lb = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(w_us))
    rb = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(w_us))
    l = left.withColumn("__lb", F.explode(F.array(lb - 1, lb)))
    r = right.withColumn("__rb", rb)
    pairs = l.join(
        r,
        (F.col("__lb") == F.col("__rb"))
        & (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {int(window_s)} SECONDS"))
        & (F.col(right_ts) <= F.col(left_ts)),
        "inner",
    )
    return pairs.drop("__lb", "__rb")
