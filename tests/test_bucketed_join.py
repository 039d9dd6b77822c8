"""Bucketed co-located join: pre-bucketing both fact tables on the join key
removes the shuffle from every subsequent join on that key — the layout
decision that matters most at 100 TB, where a fact-fact SMJ's exchange IS
the job cost. (SURVEY.md §4 join planning; session.py leaves this to table
layout, which this test exercises end-to-end via saveAsTable.)"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="bucketed_")
    yield d
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{warehouse}/b_orders").mode("overwrite").saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{warehouse}/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # both sides read pre-bucketed on the join key: NO shuffle anywhere
        assert "Exchange" not in plan, plan
        # and the join result is correct
        assert joined.count() == lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_diamond_plan_reuses_exchange(spark):
    """A diamond-shaped query (same aggregated relation consumed twice)
    must reuse one shuffle (ReusedExchange), not recompute it — the
    optimizer behavior that halves the cost of self-comparison analytics
    at any scale."""
    from etl_expenses_spark.sources.readers import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
    )
    big = per_order.filter(F.col("q") > 150)
    small = per_order.filter(F.col("q") <= 150)
    # AQE defers reuse to runtime (AdaptiveSparkPlan hides it in the static
    # plan); assert on the static optimizer behavior with AQE off, the same
    # way tools/explain_audit.py audits
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        diamond = big.crossJoin(
            small.select(F.col("l_orderkey").alias("rhs_key"))
        ).limit(5)
        jvm = spark.sparkContext._jvm
        plan = jvm.PythonSQLUtils.explainString(
            diamond._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ReusedExchange" in plan, plan


def test_sql_broadcast_hint_is_honored(spark):
    from etl_expenses_spark.plans import REGISTRY

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["sql_hinted_broadcast_join"].build(
            spark, "/root/testdata/sf0.001"
        )
        jvm = spark.sparkContext._jvm
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime row-level filtering (InjectRuntimeFilter): with a selective
    dim-side predicate and a shuffle join, Catalyst plants a bloom-filter
    might_contain() on the FACT side's join key — rows that cannot join
    are dropped at the scan, before the shuffle. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    matching ~fraction; the size thresholds here are lowered because
    sf0.1 is below the production defaults (10 GB application side).
    Results must be identical with and without the filter."""
    from etl_expenses_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.01"
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def build():
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("qty"),
            )
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        filtered = build()
        plan = filtered._jdf.queryExecution().toString()
        assert "might_contain" in plan, "bloom runtime filter not injected"
        with_bloom = filtered.collect()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    plain = build()
    assert "might_contain" not in plain._jdf.queryExecution().toString()
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, plain.collect()))
