"""Date-partitioned gold layout: the watermark predicate must prune at the
file level (SURVEY.md §4 — we partition gold by date so the incremental
MAX(date) lower bound becomes partition pruning, not a full scan)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_expenses_spark.operators.merge import merge_append
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def gold():
    d = tempfile.mkdtemp(prefix="gold_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_partitioned_gold_prunes_watermark_scans(spark, gold):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    n = merge_append(orders, gold, keys=["o_orderkey"], partition_by=["order_month"])
    assert n == orders.count()

    table = spark.read.parquet(gold)
    one_month = table.filter(F.col("order_month") == "2000-03")

    # the month predicate must be a PARTITION filter (directory pruning),
    # never a data filter evaluated per row
    plan = _plan(one_month)
    partition_clause = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "order_month" in partition_clause
    # and it must NOT appear as a row-level data filter (the clause may be
    # absent entirely when partition pruning consumed the only predicate)
    if "PushedFilters" in plan:
        assert "order_month" not in plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    # correctness of the pruned read
    want = orders.filter(F.date_format("o_orderdate", "yyyy-MM") == "2000-03").count()
    assert one_month.count() == want


def test_partitioned_merge_stays_idempotent(spark, gold):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    first = orders.filter(F.col("o_orderkey") < 500)
    assert merge_append(first, gold, ["o_orderkey"], ["order_month"]) == first.count()
    # replay: zero new rows, table unchanged
    assert merge_append(first, gold, ["o_orderkey"], ["order_month"]) == 0
    assert spark.read.parquet(gold).count() == first.count()


def test_dynamic_partition_overwrite_restates_one_day(spark, gold):
    """Restating one date partition must leave every other partition's files
    untouched (partitionOverwriteMode=dynamic) — the batch 'reprocess one
    day' operation a 100 TB gold table needs; static mode would truncate
    the whole table."""
    gold = gold + "/table"
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.partitionBy("order_month").parquet(gold)
    before = spark.read.parquet(gold)
    n_total = before.count()
    n_march = before.filter(F.col("order_month") == "2000-03").count()
    assert 0 < n_march < n_total

    restated = (
        orders.filter(F.col("order_month") == "2000-03")
        .withColumn("o_orderpriority", F.lit("RESTATED"))
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("order_month")
        .parquet(gold)
    )
    after = spark.read.parquet(gold)
    assert after.count() == n_total  # other partitions intact
    assert (
        after.filter(F.col("order_month") == "2000-03")
        .filter(F.col("o_orderpriority") != "RESTATED")
        .count()
        == 0
    )
    assert (
        after.filter(F.col("order_month") != "2000-03")
        .filter(F.col("o_orderpriority") == "RESTATED")
        .count()
        == 0
    )
