"""Scan-elimination levers pinned as tests: static partition pruning,
dynamic partition pruning (DPP), and the plans they require.

At 100 TB the fastest bytes are the ones never read: a date-partitioned
gold table must answer a one-month question by LISTING one directory, and
a fact-dim join with a selective dim filter must prune fact partitions at
RUNTIME from the dim side (DPP). Both behaviors are plan-visible, so they
are pinned here rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.01"


def _partitioned_orders(spark, tmp_path):
    path = str(tmp_path / "orders_by_month")
    (
        load_table(spark, SF_DIR, "orders")
        .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.partitionBy("month")
        .parquet(path)
    )
    return path


def test_static_partition_pruning_reads_one_partition(spark, tmp_path):
    path = _partitioned_orders(spark, tmp_path)
    df = spark.read.parquet(path).filter(F.col("month") == "2000-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the month predicate must be a PartitionFilter (directory-level
    # elimination), not a post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    assert "month" in plan.split("PartitionFilters:")[1].split("]")[0]
    n_months = (
        load_table(spark, SF_DIR, "orders")
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .distinct()
        .count()
    )
    assert n_months > 1  # pruning actually eliminated something
    # count matches the unpartitioned filter
    expect = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.date_format("o_orderdate", "yyyy-MM") == "2000-03")
        .count()
    )
    assert df.count() == expect > 0


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    path = _partitioned_orders(spark, tmp_path)
    fact = spark.read.parquet(path)
    # dim keyed by month with a NON-join attribute; the filter sits on the
    # attribute, so the surviving month set is only known at runtime — a
    # literal month filter would be statically pushed through the join
    # instead (no DPP needed; the sibling test covers that)
    dim = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    picked = dim.orderBy("month").limit(1).select("n").first()[0]
    sel = dim.filter(F.col("n") == picked)
    j = fact.join(sel, "month")
    plan = j._jdf.queryExecution().executedPlan().toString()
    # DPP shows up as a dynamicpruning subquery in the fact scan's
    # partition filters
    assert "dynamicpruning" in plan.lower(), plan[:4000]
    months = {r.month for r in sel.select("month").collect()}
    expect = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.date_format("o_orderdate", "yyyy-MM").isin(*months))
        .count()
    )
    assert j.count() == expect > 0
