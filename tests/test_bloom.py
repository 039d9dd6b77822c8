"""Bloom semi-join reduction: the filter must never lose a true match
(no false negatives ever), must actually reduce (false-positive rate near
the (1-e^{-Kn/m})^K design point), and the end-to-end semijoin must equal a
plain left-semi join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_semijoin,
)


def test_no_false_negatives_and_low_fp(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", n_bits=1 << 16, n_hashes=4)
    kept = set(r.k for r in bloom_probe(probe, "k", bloom, n_bits=1 << 16,
                                        n_hashes=4).collect())
    truth = set(r.k for r in probe.join(build.distinct(), "k", "left_semi").collect())
    assert truth <= kept, "bloom filter dropped a true match"
    # m=65536, n=500*4 set bits -> fp ~ (1-e^{-2000/65536})^4 ~ 8e-7; allow slack
    fp = len(kept - truth)
    assert fp <= 20, f"false-positive count {fp} far above design point"


def test_semijoin_exact_vs_plain(spark):
    build = spark.range(0, 300).select((F.col("id") * 13 + 5).alias("bk"))
    probe = spark.range(0, 5000).select(
        F.col("id").alias("pk"), (F.col("id") % 97).alias("payload")
    )
    got = sorted(
        (r.pk, r.payload)
        for r in bloom_semijoin(probe, build, "pk", "bk", n_bits=1 << 14).collect()
    )
    want = sorted(
        (r.pk, r.payload)
        for r in probe.join(
            build.select(F.col("bk").alias("pk")).distinct(), "pk", "left_semi"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_relation_is_bounded(spark):
    """The scale claim: filter size is chosen, not inherited — even a large
    build side yields at most n_bits/64 words."""
    build = spark.range(0, 50000).select(F.col("id").alias("k"))
    n_words = bloom_build(build, "k", n_bits=1 << 12, n_hashes=4).count()
    assert n_words <= (1 << 12) // 64
