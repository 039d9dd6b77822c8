"""Conservation invariants of the exact-arithmetic money/credit queries:
whatever gets split must sum back EXACTLY — not approximately — because
every split is integer cents / basis points by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.plans import REGISTRY
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_installments_sum_back_to_the_cent(spark):
    out = REGISTRY["installment_schedule_expansion"].build(spark, SF_DIR)
    # reconstruct cents via decimal, not double*100 (which truncates: the
    # same pitfall the query itself avoids)
    per_order = out.groupBy("o_orderkey").agg(
        (
            F.sum((F.col("cuota_amount").cast("decimal(18,2)") * 100).cast("bigint"))
        ).alias("sum_cents")
    )
    orig = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 25 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    diff = per_order.join(orig, "o_orderkey").filter(
        F.col("sum_cents") != F.col("cents")
    )
    assert diff.count() == 0
    assert per_order.count() > 0


def test_budget_allocation_sums_to_budget_every_month(spark):
    out = REGISTRY["proportional_budget_allocation"].build(spark, SF_DIR)
    monthly = out.groupBy("m").agg(F.sum("alloc_cents").alias("total"))
    bad = monthly.filter(F.col("total") != 1_000_000)
    assert bad.count() == 0
    assert monthly.count() > 0


def test_attribution_credits_sum_to_10000bp_per_purchase(spark):
    out = REGISTRY["multitouch_attribution_credits"].build(spark, SF_DIR)
    per_purchase = out.groupBy("p_id").agg(F.sum("credit_bp").alias("total"))
    bad = per_purchase.filter(F.col("total") != 10_000)
    assert bad.count() == 0
    assert per_purchase.count() > 0


def test_pps_sample_pick_count_is_k_or_k_plus_one(spark):
    out = REGISTRY["pps_sample_documents"].build(spark, SF_DIR)
    total = out.agg(F.sum("n_picks")).collect()[0][0]
    assert 200 <= total <= 201
