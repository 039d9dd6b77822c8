"""Idempotency property: loading the same batch twice == once (the J1-J4
exactly-once contract, `/root/reference/load_data/lambda_function.py:39-73`)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from etl_expenses_spark.operators.merge import merge_append, new_rows
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_merge_append_idempotent(spark):
    target = tempfile.mkdtemp(prefix="gold_")
    shutil.rmtree(target)  # merge_append handles a missing target
    orders = load_table(spark, SF_DIR, "orders").limit(500)
    try:
        n1 = merge_append(orders, target, keys=["o_orderkey"])
        assert n1 == 500
        n2 = merge_append(orders, target, keys=["o_orderkey"])
        assert n2 == 0, "re-loading the same batch must be a no-op"
        assert spark.read.parquet(target).count() == 500
        # overlapping batch: only genuinely new keys are appended
        more = load_table(spark, SF_DIR, "orders").limit(600)
        n3 = merge_append(more, target, keys=["o_orderkey"])
        assert n3 == 100
        final = spark.read.parquet(target)
        assert final.count() == 600
        assert final.select("o_orderkey").distinct().count() == 600
    finally:
        shutil.rmtree(target, ignore_errors=True)


def test_new_rows_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)], ["k1", "k2", "v"]
    )
    target = spark.createDataFrame([(1, "a", 99.0)], ["k1", "k2", "v"])
    got = sorted(tuple(r) for r in new_rows(df, target, ["k1", "k2"]).collect())
    assert got == [(1, "b", 20.0), (2, "a", 30.0)]
