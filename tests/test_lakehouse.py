"""Lakehouse layout operators: the physical properties that justify them.

- bucketed co-located join: ZERO ShuffleExchange in the join subtree
- z-order layout: per-file min/max spans shrink on BOTH clustered columns
  versus a single-column sort (the data-skipping win, measured not assumed)
- compaction plan: bins are contiguous, complete, and within one file of
  the byte target
- zvalue2: exact bit interleaving
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.operators.lakehouse import (
    colocated_join,
    compaction_plan,
    write_bucketed,
    zorder_layout,
    zvalue2,
)
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_zvalue2_interleaves_bits(spark):
    # a=0b11 -> even positions 0,2 = 5; b=0b10 -> odd position 3 = 8
    row = spark.range(1).select(
        zvalue2(F.lit(3), F.lit(2)).alias("z"),
        zvalue2(F.lit(0), F.lit(0)).alias("z0"),
        zvalue2(F.lit(0xFFFF), F.lit(0)).alias("za"),
        zvalue2(F.lit(0), F.lit(0xFFFF)).alias("zb"),
    ).first()
    assert row.z == 13
    assert row.z0 == 0
    assert row.za == 0x55555555  # all even bit positions
    assert row.zb == 0xAAAAAAAA  # all odd bit positions


def test_bucketed_join_has_no_shuffle_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(orders, "t_b_orders", "o_custkey", n_buckets=4, sort_cols=["o_custkey"])
    write_bucketed(customer, "t_b_customer", "c_custkey", n_buckets=4, sort_cols=["c_custkey"])
    # model the 100 TB case this layout exists for: neither side fits a
    # broadcast, so the planner must fall back to sort-merge — which the
    # matching bucket specs then run with no Exchange at all
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(
            spark,
            "t_b_orders",
            "t_b_customer",
            on=F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # the whole point of bucketing
        assert "Bucketed: true" in plan, plan
        # (the per-task Sort remains: a bucket can span several files, so
        # the writer's sortBy can't be assumed globally sorted per bucket —
        # that sort is local and cheap; the eliminated Exchange is the
        # network pass that matters)
        # and it still computes the right thing
        plain = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_zorder_layout_shrinks_per_file_spans(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    n_files = 16

    def avg_spans(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        per_file = df.groupBy("f").agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("span_a"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("span_b"),
        )
        r = per_file.agg(F.avg("span_a"), F.avg("span_b")).first()
        return r[0], r[1]

    single = str(tmp_path / "single")
    li.repartitionByRange(n_files, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(single)
    zpath = str(tmp_path / "zorder")
    zorder_layout(li, "l_partkey", "l_suppkey", n_files=n_files).write.parquet(zpath)

    sa_1, sb_1 = avg_spans(single)
    sa_z, sb_z = avg_spans(zpath)
    # single-column sort: near-perfect on partkey, no clustering on suppkey.
    # z-order trades a little partkey locality for clustering on BOTH:
    # suppkey span must shrink a lot while partkey span stays far below the
    # full range.
    full_a = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    full_b = li.agg(F.max("l_suppkey") - F.min("l_suppkey")).first()[0]
    assert sb_1 > 0.8 * full_b  # sorted-by-a leaves b unclustered
    assert sb_z < 0.5 * full_b  # z-order clusters b
    assert sa_z < 0.5 * full_a  # ...while still clustering a
    # combined normalized span strictly better than single-column layout
    assert (sa_z / full_a + sb_z / full_b) < (sa_1 / full_a + sb_1 / full_b)


def test_compaction_plan_bins_are_contiguous_and_sized(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    target = 16384
    plan = compaction_plan(
        docs, "n_chars", "doc_id", target, bucket=F.expr("doc_id div 64")
    ).collect()
    plan.sort(key=lambda r: r.doc_id)
    # complete: every input row got a bin
    assert len(plan) == docs.count()
    # contiguous in doc order: bin ids never decrease and have no gaps
    bins = [r.bin for r in plan]
    assert bins == sorted(bins)
    assert set(bins) == set(range(max(bins) + 1))
    # sized: no bin exceeds target + one file (first-fit invariant)
    from collections import defaultdict

    tot = defaultdict(int)
    mx = max(r.n_chars for r in plan)
    for r in plan:
        tot[r.bin] += r.n_chars
    assert all(v <= target + mx for v in tot.values())
    # and bins (except possibly the last) are not pathologically small:
    # first-fit fills to >= target - max_file before spilling over
    last = max(bins)
    assert all(v >= target - mx for b, v in tot.items() if b != last)
