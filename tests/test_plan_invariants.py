"""Physical-plan invariants as pytest (plan-only, no execution): the
queries whose whole value is their PLAN shape keep that shape. A regression
here (a broadcast turning into a nested loop, a pushed filter lost, a
top-k becoming a global sort) is a scale bug even while results stay
correct — so it must fail the suite, not just the nightly audit tool."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from explain_audit import audit, plan_string  # noqa: E402

from etl_expenses_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    return plan_string(REGISTRY[name].build(spark, SF_DIR))


def test_audited_invariants_on_key_queries(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in (
            "flagship_spend_by_category",
            "range_join_recent_clicks",
            "pit_join_events_user_tier",
            "fuzzy_match_part_names",
            "keyset_pagination_orders",
        ):
            problems = audit(name, _plan(spark, name))
            assert not problems, f"{name}: {problems}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_keyset_pagination_is_topk_not_global_sort(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(spark, "keyset_pagination_orders")
        assert "TakeOrderedAndProject" in plan
        # the seek predicate must reach the parquet scan
        assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters:")[1][:200]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_pit_join_is_hash_join_not_nested_loop(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(spark, "pit_join_events_user_tier")
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_runtime_bloom_filter_injects_on_filtered_dim_join(spark):
    """The 100 TB shuffle-join shape: fact ⋈ selectively-filtered dim.
    When the join is too big to broadcast, Catalyst's runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter, on by default in Spark 4)
    should inject a `bloom_filter_might_contain` semi-reduction on the
    fact side, cutting shuffled fact rows to ~the dim selectivity before
    the exchange. Our plans are declarative joins over load_table scans,
    so injection eligibility is free — this pins that no plumbing (UDFs,
    barriers, re-partitioning) ever breaks it. Thresholds are lowered
    in-test because the default application-side gate is 10 GB, sized for
    the real cluster, not sf0.001."""
    from etl_expenses_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, SF_DIR, "orders")
        cust = load_table(spark, SF_DIR, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
            "c_nationkey"
        ).count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
