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
