"""Distributed as-of join (backward) — a composite of union + window.

Spark has no native ASOF JOIN. The classic scalable construction: tag both
sides, union them, and run a single ``last(..., ignorenulls=True)`` window
per key ordered by time — one shuffle on (key), no range explosion, no
per-key collect. This holds at any scale: the window partitions by join key,
so skew only appears if one key dominates (salt the window key if so).

vs. the O(|L|×|R|) naive range join, this is O((|L|+|R|) log) within each
key partition — the standard pattern also used for the reference's
"latest report" recency semantics
(`/root/reference/extract_data_mp/lambda_function.py:102-104`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each ``left`` row, attach the most recent ``right`` row with the
    same key and ``right_ts <= left_ts`` (inclusive). Right rows must be
    unique per (key, ts) — pre-aggregate if not.

    Returns all left columns plus ``payload_cols`` from right (nullable).
    """
    l_tagged = left.withColumn("__k", F.col(left_key)).withColumn("__t", F.col(left_ts)).withColumn(
        "__is_right", F.lit(0)
    )
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    r_tagged = (
        right.select(
            F.col(right_key).alias("__k"),
            F.col(right_ts).alias("__t"),
            payload_struct.alias("__payload"),
        )
        .withColumn("__is_right", F.lit(1))
    )
    l_cols = l_tagged.columns
    unioned = l_tagged.withColumn(
        "__payload", F.lit(None).cast(r_tagged.schema["__payload"].dataType)
    ).select(*l_cols, "__payload").unionByName(
        r_tagged.select(
            *[
                F.lit(None).cast(l_tagged.schema[c].dataType).alias(c)
                if c not in ("__k", "__t", "__is_right")
                else F.col(c)
                for c in l_cols
            ],
            "__payload",
        )
    )
    # right rows sort before left rows at equal __t → inclusive (<=) match
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in payload_cols
    ]
    return carried.filter(F.col("__is_right") == 0).select(*out_cols)


def asof_join_backward_salted(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """``asof_join_backward`` with the hot-key window SALTED by time bucket
    — output is row-identical to the unsalted join (planted-skew test in
    tests/test_wap_skew.py).

    The plain construction windows by key alone, so a celebrity key's
    entire timeline lands on ONE task. This variant is the classic
    segmented-scan decomposition of the running ``last``:

    1. bucket every row by fixed time width → window over (key, bucket):
       the hot key now spreads across timeline/width tasks;
    2. per (key, bucket) compute the carry-out (latest right payload in
       the bucket) — ONE row per key×bucket, a tiny relation;
    3. a second window over that tiny relation (per key, ordered by
       bucket, rows < current) yields each bucket's carry-IN;
    4. final match = within-bucket partial, else the bucket's carry-in.

    Cost: one extra small shuffle + a (usually broadcast) join vs the
    unsalted plan. Pick ``bucket_seconds`` so a hot key's densest bucket
    fits a task; buckets-per-key stays bounded by timespan/width, which is
    what keeps step 3 small at 100 TB.
    """
    l_tagged = (
        left.withColumn("__k", F.col(left_key))
        .withColumn("__t", F.col(left_ts))
        .withColumn("__is_right", F.lit(0))
    )
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        payload_struct.alias("__payload"),
    ).withColumn("__is_right", F.lit(1))
    l_cols = l_tagged.columns
    unioned = (
        l_tagged.withColumn(
            "__payload", F.lit(None).cast(r_tagged.schema["__payload"].dataType)
        )
        .select(*l_cols, "__payload")
        .unionByName(
            r_tagged.select(
                *[
                    F.lit(None).cast(l_tagged.schema[c].dataType).alias(c)
                    if c not in ("__k", "__t", "__is_right")
                    else F.col(c)
                    for c in l_cols
                ],
                "__payload",
            )
        )
        .withColumn(
            "__b", F.floor(F.col("__t").cast("double") / F.lit(bucket_seconds)).cast("long")
        )
    )

    # 1. within-bucket running last (right-before-left at ties → inclusive)
    w_in = (
        W.partitionBy("__k", "__b")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seg = unioned.withColumn("__partial", F.last("__payload", ignorenulls=True).over(w_in))

    # 2. carry-out per (key, bucket): latest right payload of the bucket
    #    (right rows are unique per (key, ts) by contract)
    carry_out = (
        unioned.filter(F.col("__is_right") == 1)
        .groupBy("__k", "__b")
        .agg(F.max_by("__payload", "__t").alias("__carry"))
    )
    # bucket spine: every (key, bucket) present on either side, so buckets
    # with only left rows still receive a carry-in
    spine = unioned.select("__k", "__b").distinct()
    # 3. cross-bucket carry-in over the TINY per-bucket relation
    w_b = W.partitionBy("__k").orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    carry_in = (
        spine.join(carry_out, ["__k", "__b"], "left")
        .withColumn("__carry_in", F.last("__carry", ignorenulls=True).over(w_b))
        .select("__k", "__b", "__carry_in")
    )

    # 4. stitch: within-bucket partial wins, else the bucket's carry-in
    out_cols = [c for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in payload_cols
    ]
    return (
        seg.filter(F.col("__is_right") == 0)
        .join(carry_in, ["__k", "__b"], "left")
        .withColumn("__match", F.coalesce(F.col("__partial"), F.col("__carry_in")))
        .select(*out_cols)
    )
