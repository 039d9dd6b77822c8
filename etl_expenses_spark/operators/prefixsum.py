"""Distributed global prefix sum (cumulative sum over a total order).

The naive Spark plan — ``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY —
collapses the whole table into ONE window partition: a single task holds
100 TB. The scale-safe shape is the classic two-phase scan:

1. bucket rows by a *range* of the order key (order-preserving),
2. cumulative sum WITHIN each bucket (bounded window partitions),
3. per-bucket totals → running offset across buckets (a window over the
   tiny bucket-totals relation), broadcast-joined back.

Total cost: one bounded window pass + one broadcast join; no driver
collect, no single-partition stage. Same recurrence as Blelloch's scan,
expressed as two DataFrame windows.

Used by :func:`pps_sample` — probability-proportional-to-size sampling
(pick training docs ∝ length/quality) — which stays in exact integer
arithmetic so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def single_defined_partition(col: Column) -> Column:
    """Partition key for a window over a KNOWN-SMALL relation (bucket
    totals, months, days): constant 0 for every row, but written as
    ``pmod(col, 1)`` because Catalyst constant-folds ``lit(0)`` out of the
    partition spec entirely, degrading the window to the unpartitioned
    escape hatch (and its "No Partition Defined" warning). The pmod form
    survives optimization, so the plan keeps an explicit single-partition
    spec — same execution, declared intent."""
    return F.pmod(col, F.lit(1))


def distributed_cumsum(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str,
    bucket: Column,
    out_col: str = "cum",
) -> DataFrame:
    """Inclusive cumulative sum of ``value_col`` in ``order_col`` order
    (a single column or a list — pass a unique tiebreaker when the leading
    key has duplicates, else the cumsum at tied rows is order-dependent).

    ``bucket`` must be a monotone function of the LEADING order key (e.g.
    ``F.floor(F.col("doc_id") / 1000)`` or a repartitionByRange id): all
    rows of bucket b sort before all rows of bucket b+1. Bucket count
    should be ~#partitions × small-k; per-bucket row count bounds window
    partition size.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    b = df.withColumn("__b", bucket)
    in_bucket = W.partitionBy("__b").orderBy(*order_cols).rowsBetween(W.unboundedPreceding, 0)
    b = b.withColumn("__cum_in", F.sum(value_col).over(in_bucket))
    totals = b.groupBy("__b").agg(F.sum(value_col).alias("__tot"))
    off_w = (
        W.partitionBy(single_defined_partition(F.col("__b")))
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn("__off", F.coalesce(F.sum("__tot").over(off_w), F.lit(0)))
    # offsets has one row per bucket — broadcast; the big side never re-shuffles
    out = b.join(F.broadcast(offsets.select("__b", "__off")), "__b")
    return out.withColumn(out_col, F.col("__cum_in") + F.col("__off")).drop(
        "__b", "__cum_in", "__off"
    )


def pps_sample(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    k: int,
    bucket: Column,
) -> DataFrame:
    """Systematic probability-proportional-to-size sample of ~``k`` rows.

    Lay all rows on a line segment sized by integer ``weight_col`` (in
    ``order_col`` order), then take every ``total/k``-th point: a row is
    selected iff its weight interval ``(cum - w, cum]`` covers a multiple
    of the step. Selection count per row = how many multiples it covers
    (heavy rows can be picked >1×; we expose the multiplicity).

    Exact integer arithmetic end to end — floor divisions only — so Spark
    and the SQL oracle agree bit-for-bit, unlike u^(1/w) weighted sampling
    whose libm pow/log differ across engines in the last ulp.
    """
    cum = distributed_cumsum(df, order_col, weight_col, bucket)
    # step >= 1: when total weight < k the walk degenerates to "take every
    # row at most once per weight unit" instead of dividing by zero
    # `div` = integral division: the quotient never routes through a
    # double, so it stays exact at any magnitude (floor(x/y) on doubles is
    # only bit-identical to `x // y` while the operands fit in 2^53)
    total_step = cum.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"sum({weight_col}) div {int(k)}").cast("long"),
        ).alias("__step")
    )
    out = cum.join(F.broadcast(total_step))
    picks = (
        F.expr("cum div __step")
        - F.expr(f"(cum - {weight_col}) div __step")
    ).cast("long")
    return out.withColumn("n_picks", picks).filter(F.col("n_picks") >= 1).drop("__step")


def pps_sample_stratified(
    df: DataFrame,
    group_col: str,
    order_col: str | list[str],
    weight_col: str,
    k_per_group: int,
    bucket: Column,
) -> DataFrame:
    """Per-group systematic PPS sample: ~``k_per_group`` rows drawn from
    EACH group proportional to ``weight_col`` — the source-balanced token
    sampler (every source contributes ~k docs weighted by length, so no
    single corpus dominates the training mix regardless of its row count).

    Same exact-integer walk as pps_sample, with the cumulative line laid
    per group: bounded per-(group, bucket) windows build the within-group
    running weight, per-group bucket offsets ride a #groups×#buckets-row
    window (bounded: buckets per group, not rows), and each group's step
    is its own total div k. Floor divisions only — bit-identical to the
    SQL oracle on any engine or partitioning."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    b = df.withColumn("__b", bucket)
    in_bucket = (
        W.partitionBy(group_col, "__b")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    b = b.withColumn("__cum_in", F.sum(weight_col).over(in_bucket))
    totals = b.groupBy(group_col, "__b").agg(F.sum(weight_col).alias("__tot"))
    off_w = (
        W.partitionBy(group_col).orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(off_w), F.lit(0))
    )
    cum = (
        b.join(F.broadcast(offsets.select(group_col, "__b", "__off")), [group_col, "__b"])
        .withColumn("cum", F.col("__cum_in") + F.col("__off"))
        .drop("__b", "__cum_in", "__off")
    )
    steps = df.groupBy(group_col).agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"sum({weight_col}) div {int(k_per_group)}").cast("long"),
        ).alias("__step")
    )
    j = cum.join(F.broadcast(steps), group_col)
    picks = (
        F.expr("cum div __step") - F.expr(f"(cum - {weight_col}) div __step")
    ).cast("long")
    return j.withColumn("n_picks", picks).filter(F.col("n_picks") >= 1).drop("__step")


def utf8_prefix_bucket(col: Column, nbytes: int = 2) -> Column:
    """Monotone bucket for a STRING sort key: the first ``nbytes`` UTF-8
    bytes read as a big-endian integer. Spark orders strings by unsigned
    byte-wise comparison of their UTF-8 encoding, so this is exactly
    non-decreasing in the string order for ANY code point — unlike
    ``ascii(substring(k,i,1))``, which returns the full code point of a
    multi-byte character (ascii('中') = 20013 > 255) and breaks the
    monotone-bucket contract distributed_cumsum/distributed_rank require
    (ADVICE r10). Missing bytes pad as 0x00 (hex rpad), matching
    "a shorter prefix sorts first"; '' maps to bucket 0."""
    return F.conv(
        F.rpad(
            F.hex(F.substring(F.encode(col, "UTF-8"), 1, nbytes)),
            2 * nbytes,
            "0",
        ),
        16,
        10,
    ).cast("long")


def distributed_rank(
    df: DataFrame,
    order_col: str | list[str],
    bucket: Column,
    out_col: str = "rnk",
) -> DataFrame:
    """Global 1-based row number in ``order_col`` order WITHOUT the
    single-partition ``ROW_NUMBER() OVER (ORDER BY …)`` window: it is just
    the distributed cumulative sum of 1s. Needs a unique (possibly
    composite) order key for determinism."""
    with_one = df.withColumn("__one", F.lit(1))
    return (
        distributed_cumsum(with_one, order_col, "__one", bucket, out_col=out_col)
        .drop("__one")
    )
