"""Blocked fuzzy matching (operators/fuzzy.py) and the two-phase
distributed prefix sum / PPS sampler (operators/prefixsum.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.operators.fuzzy import blocked_fuzzy_pairs, fuzzy_join_best_match
from etl_expenses_spark.operators.prefixsum import distributed_cumsum, pps_sample


def test_blocked_pairs_match_naive_within_block(spark):
    rows = [
        (1, "small ring"),
        (2, "small rings"),   # dist 1 from #1
        (3, "small gear"),    # dist 4 from "small ring"
        (4, "red ring"),      # different block — never compared
        (5, "smallish ring"), # block "smallish" — never compared
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_fuzzy_pairs(
            df, "id", "name", F.split(F.col("name"), " ")[0], max_dist=4
        ).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 4), (2, 3, 5)} - {(2, 3, 5)}
    # pair (4, x) absent: blocking correctly prunes cross-block candidates


def test_best_match_picks_lowest_distance_with_deterministic_ties(spark):
    left = spark.createDataFrame([(10, "blue bolt")], ["id", "name"])
    right = spark.createDataFrame(
        [(1, "blue bolts"), (2, "blue bort"), (3, "blue colt")], ["rid", "rname"]
    )
    out = fuzzy_join_best_match(
        left, right, "id", "name", "rid", "rname",
        F.split(F.col("name"), " ")[0], F.split(F.col("rname"), " ")[0],
        max_dist=2,
    ).collect()
    assert len(out) == 1
    # all three candidates are dist 1; tie broken by lowest right id
    assert out[0].match_id == 1 and out[0].dist == 1


def test_distributed_cumsum_equals_single_window(spark):
    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("w")
    )
    fast = distributed_cumsum(df, "id", "w", bucket=F.floor(F.col("id") / 64))
    from pyspark.sql.window import Window as W

    single = W.orderBy("id").rowsBetween(W.unboundedPreceding, 0)
    expected = {r.id: r.c for r in df.select("id", F.sum("w").over(single).alias("c")).collect()}
    got = {r.id: r.cum for r in fast.collect()}
    assert got == expected


def test_pps_sample_total_picks_and_weight_bias(spark):
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 10 + 1).alias("w"))
    out = pps_sample(df, "id", "w", k=50, bucket=F.floor(F.col("id") / 128))
    rows = out.collect()
    # systematic sampling yields k or k+1 picks (boundary multiple)
    assert 50 <= sum(r.n_picks for r in rows) <= 51
    # heavier rows must be over-represented: mean weight of picks > population mean
    pop_mean = 5.5
    pick_mean = sum(r.w * r.n_picks for r in rows) / sum(r.n_picks for r in rows)
    assert pick_mean > pop_mean


# ---------------------------------------------------------------------------
# Property tests: the distributed implementations equal their naive
# single-node definitions on arbitrary inputs.
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st

PROP = settings(max_examples=6, deadline=None)


@PROP
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=50),
)
def test_cumsum_property_equals_python_prefix_sum(spark, weights, bucket_width):
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r.id: r.cum
        for r in distributed_cumsum(
            df, "id", "w", bucket=F.floor(F.col("id") / bucket_width)
        ).collect()
    }
    acc, want = 0, {}
    for i, w in enumerate(weights):
        acc += w
        want[i] = acc
    assert got == want


@PROP
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=8).filter(lambda s: s.strip()),
        min_size=2,
        max_size=25,
        unique=True,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_blocked_fuzzy_pairs_property_equals_naive(spark, names, max_dist):
    import itertools

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_fuzzy_pairs(
            df, "id", "name", F.split(F.trim(F.col("name")), r"\s+")[0], max_dist
        ).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if a.strip().split()[0] == b.strip().split()[0] and lev(a, b) <= max_dist
    }
    assert got == want


def test_pps_stratified_partition_invariance_and_budget(spark):
    """Stratified PPS: the selected row set is identical under different
    partitionings (exact integer walk — no partition-order dependence),
    every source lands within one pick of its ~k budget (systematic
    sampling over a line of total weight W with step W div k yields
    floor(W/step) in [k, k + k/(W div k)] picks), and per-row multiplicity
    matches the interval-covering definition."""
    from etl_expenses_spark.operators.prefixsum import pps_sample_stratified
    from etl_expenses_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "source", "doc_id", "n_chars"
    )
    k = 20

    def run(df):
        return {
            (r.source, r.doc_id, r.n_picks)
            for r in pps_sample_stratified(
                df,
                group_col="source",
                order_col="doc_id",
                weight_col="n_chars",
                k_per_group=k,
                bucket=F.floor(F.col("doc_id") / F.lit(64)),
            ).collect()
        }

    base = run(docs)
    assert base == run(docs.repartition(7))
    assert base == run(docs.repartition(3, "doc_id"))

    # per-source pick totals hover at ~k (exact systematic-walk bound)
    per_source: dict[str, int] = {}
    for src, _, n in base:
        per_source[src] = per_source.get(src, 0) + n
    n_sources = docs.select("source").distinct().count()
    assert len(per_source) == n_sources
    for src, total in per_source.items():
        assert k <= total <= k + 3, (src, total)


def test_utf8_prefix_bucket_monotone_on_non_ascii(spark):
    """ADVICE r10: the sorted-neighborhood bucket must be monotone under
    Spark's byte-wise string ordering even for multi-byte code points —
    the old ascii()-based bucket ranked 'a中' AFTER 'b0'. distributed_rank
    with utf8_prefix_bucket must reproduce a global ORDER BY exactly."""
    from etl_expenses_spark.operators.prefixsum import (
        distributed_rank,
        utf8_prefix_bucket,
    )

    keys = [
        "", "a", "a中x", "b0", "añejo", "Ω", "日本語", "zz", "\x01ctl",
        "ab", "aé", "a߿", "a￿", "中", "中z",
    ]
    df = spark.createDataFrame([(k, i) for i, k in enumerate(keys)], "k string, i long")
    ranked = distributed_rank(
        df.repartition(7), ["k", "i"], utf8_prefix_bucket(F.col("k")), out_col="gr"
    )
    got = [r.k for r in ranked.orderBy("gr").collect()]
    want = [r.k for r in df.orderBy("k", "i").collect()]
    assert got == want
    # and the bucket itself is non-decreasing along the sorted order
    bks = (
        df.select("k", utf8_prefix_bucket(F.col("k")).alias("b"))
        .orderBy("k")
        .collect()
    )
    assert all(bks[j].b <= bks[j + 1].b for j in range(len(bks) - 1))
