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
