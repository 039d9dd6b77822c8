"""Bucketed interval join == naive non-equi join (operators/rangejoin.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.operators.rangejoin import bucketed_interval_pairs
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_pairs_match_naive_nonequi(spark):
    ev = load_table(spark, SF_DIR, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    fast = bucketed_interval_pairs(
        errors, clicks, "user_id", "c_user", "ts", "c_ts", window_s=300
    )
    naive = errors.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 300 SECONDS"))
        & (F.col("c_ts") <= F.col("ts")),
        "inner",
    )
    a = {tuple(r) for r in fast.select("event_id", "c_id").collect()}
    b = {tuple(r) for r in naive.select("event_id", "c_id").collect()}
    assert a == b
    assert len(a) > 0  # the window actually matches something at sf0.001


def test_each_candidate_pair_produced_once(spark):
    ev = load_table(spark, SF_DIR, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    fast = bucketed_interval_pairs(
        errors, clicks, "user_id", "c_user", "ts", "c_ts", window_s=300
    )
    dupes = fast.groupBy("event_id", "c_id").count().filter(F.col("count") > 1)
    assert dupes.count() == 0
