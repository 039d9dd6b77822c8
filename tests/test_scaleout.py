"""fan_out / planned-partition probe cache (r14, VERDICT r13 #6).

The probe cache must never change fan_out's DECISION — only skip the
repeated physical-planning pass when the same (session, plan) is probed
again. These tests pin: the upward-only semantics, the cache hit on a
re-built identical plan, and that distinct plans do not alias.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark import scaleout
from etl_expenses_spark.scaleout import _PROBE_CACHE, _planned_partitions, fan_out


def _narrow(spark):
    # range with numPartitions=1 plans as one task — the starved-scan shape
    return spark.range(0, 1000, 1, 1).withColumn("k", F.col("id") % 7)


def test_fan_out_raises_narrow_input(spark):
    n = spark.sparkContext.defaultParallelism
    out = fan_out(_narrow(spark), "k")
    assert out.rdd.getNumPartitions() == n
    # row-preserving: repartition only moves rows
    assert out.count() == 1000


def test_fan_out_identity_on_wide_input(spark):
    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, n + 2)
    out = fan_out(wide, "id")
    # identity — no exchange added on an already-wide frame
    assert out is wide


def test_probe_cache_hits_on_rebuilt_plan(spark):
    scaleout._PROBE_CACHE.clear()
    a = _narrow(spark)
    n1 = _planned_partitions(a)
    assert len(_PROBE_CACHE) == 1
    # the SAME plan built again (fresh DataFrame object) must hit the cache
    b = _narrow(spark)
    n2 = _planned_partitions(b)
    assert len(_PROBE_CACHE) == 1
    assert n1 == n2 == 1


def test_probe_cache_distinguishes_plans(spark):
    scaleout._PROBE_CACHE.clear()
    one = spark.range(0, 100, 1, 1)
    three = spark.range(0, 100, 1, 3)
    assert _planned_partitions(one) == 1
    assert _planned_partitions(three) == 3
    assert len(_PROBE_CACHE) == 2


def test_probe_matches_public_rdd_count(spark):
    # the JVM-internal toRdd count must agree with the public df.rdd count
    for parts in (1, 2, 5):
        df = spark.range(0, 50, 1, parts)
        assert _planned_partitions(df) == df.rdd.getNumPartitions()
