"""APSS exactness: the Bayardo prefix-filtered cosine join must return the
EXACT >= t pair set (no recall loss, no false positives) versus a
brute-force all-pairs computation, and containment must catch the
short-doc-inside-long-doc case symmetric Jaccard under-scores."""

from __future__ import annotations

import itertools
import math
from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_expenses_spark.operators.apss import (
    allpairs_cosine_prefix,
    containment_pairs_inverted,
)
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _brute_cosine_pairs(rows, threshold):
    tf = {r.doc_id: Counter(r.text.lower().split()) for r in rows}
    out = {}
    for a, b in itertools.combinations(sorted(tf), 2):
        dot = sum(fa * tf[b][t] for t, fa in tf[a].items())
        if dot == 0:
            continue
        na = math.sqrt(sum(f * f for f in tf[a].values()))
        nb = math.sqrt(sum(f * f for f in tf[b].values()))
        cos = dot / (na * nb)
        if cos >= threshold:
            out[(a, b)] = cos
    return out


def test_prefix_filter_exact_vs_bruteforce_documents(spark):
    """On the real sf0.001 documents table (with planted dups) the prefix
    tier loses nothing and invents nothing at two thresholds."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = docs.collect()
    for t in (0.95, 0.8):
        want = _brute_cosine_pairs(rows, t)
        got = {
            (r.id_a, r.id_b): r.cos_sim
            for r in allpairs_cosine_prefix(docs, threshold=t).collect()
        }
        assert set(got) == set(want), (
            f"t={t}: missing={set(want) - set(got)} extra={set(got) - set(want)}"
        )
        for k, v in got.items():
            assert abs(v - want[k]) < 1e-6


def test_prefix_filter_planted_geometry(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),                      # exact dup -> cos 1.0
            Row(doc_id=3, text=base.replace("kappa", "mu")),  # 9/10 shared
            Row(doc_id=4, text="unrelated words entirely different content here"),
        ]
    )
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in allpairs_cosine_prefix(df, threshold=0.85).collect()
    }
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 3)] - 0.9) < 1e-6 and abs(got[(2, 3)] - 0.9) < 1e-6
    assert not any(4 in p for p in got)


def test_sparse_tier_matches_dense_tier_and_bruteforce(spark):
    """Tier equivalence: the sf0.001 documents vocabulary is tiny, so the
    default call takes the dense GEMM tier; forcing dense_vocab_max=0 runs
    the prefix-filtered sparse tier on the same corpus. Both must equal the
    brute-force ≥ t set exactly, with bit-identical quantized cosines."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    want = _brute_cosine_pairs(docs.collect(), 0.9)
    dense = {
        (r.id_a, r.id_b): r.cos_sim
        for r in allpairs_cosine_prefix(docs, threshold=0.9).collect()
    }
    sparse = {
        (r.id_a, r.id_b): r.cos_sim
        for r in allpairs_cosine_prefix(
            docs, threshold=0.9, dense_vocab_max=0
        ).collect()
    }
    assert set(dense) == set(want) and set(sparse) == set(want)
    assert dense == sparse  # bit-identical after 1e-6 quantization


def test_containment_catches_embedded_short_doc(spark):
    long_doc = " ".join(f"w{i}" for i in range(200))
    short_doc = " ".join(f"w{i}" for i in range(40, 60))  # fully embedded
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="s", text=long_doc),
            Row(doc_id=2, source="s", text=short_doc),
            Row(doc_id=3, source="s", text="nothing shared at all in this one ok"),
            Row(doc_id=4, source="OTHER", text=short_doc),  # blocked away
        ]
    )
    got = {
        (r.id_small, r.id_big): r.containment
        for r in containment_pairs_inverted(df, threshold=0.9, k=3).collect()
    }
    # short doc has 18 shingles, all present in long doc -> containment 1.0
    assert got.get((2, 1)) == 1.0
    # the reverse direction (long contained in short) is far below threshold
    assert (1, 2) not in got
    # different source block never pairs despite identical text
    assert not any(4 in p for p in got)


def test_prefix_index_is_proper_subset(spark):
    """The scale claim: the prefix posting relation must be strictly smaller
    than the full TF relation (that's where the Σ|posting|² saving comes
    from at high thresholds)."""
    from etl_expenses_spark.operators.apss import term_frequencies

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    full = term_frequencies(docs).count()
    # rebuild just the prefix side the operator uses internally
    from pyspark.sql.window import Window as W

    tf = term_frequencies(docs)
    norms = tf.groupBy("id").agg(F.sum(F.col("f") * F.col("f")).alias("n2"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("id").orderBy("df", "term").rowsBetween(
        W.unboundedPreceding, -1
    )
    t = 0.95
    prefix_n = (
        tf.join(df_tbl, "term")
        .join(norms, "id")
        .withColumn(
            "mass_before",
            F.coalesce(F.sum(F.col("f") * F.col("f")).over(w), F.lit(0)),
        )
        .filter(
            F.col("mass_before").cast("double")
            <= (1.0 - t * t) * F.col("n2").cast("double")
        )
        .count()
    )
    assert prefix_n < full * 0.5, (prefix_n, full)


def test_jaccard_prefix_join_equals_bruteforce(spark):
    """Prefix filtering loses nothing: the corpus-wide exact Jaccard join
    equals the all-pairs brute force on a corpus with planted near-dups,
    cross-'block' duplicates, and sub-threshold pairs."""
    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.apss import allpairs_jaccard_prefix

    rep = "the quick brown fox jumps over the lazy dog again " * 3
    rows = [
        (1, rep + "tail one extra words here"),
        (2, rep + "tail two extra words here"),          # near-dup of 1
        (3, "completely different content about nothing at all " * 4),
        (4, rep),                                         # subset-ish of 1/2
        (5, "the quick brown fox stops here"),            # sub-threshold
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.5
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in allpairs_jaccard_prefix(docs, threshold=t).collect()
    }

    # brute force over the same hashed shingle sets
    from etl_expenses_spark.functions.text import tokens
    from etl_expenses_spark.operators.dedup import shingles_of_tokens

    sets = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(shingles_of_tokens(tokens(F.col("text")), 3),
                        lambda s: F.xxhash64(s))
        ).alias("s"),
    ).collect()
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = set(sets[i]["s"]), set(sets[j]["s"])
            jac = len(a & b) / max(len(a | b), 1)
            if jac >= t:
                pair = tuple(sorted((sets[i]["doc_id"], sets[j]["doc_id"])))
                want.add((pair[0], pair[1], round(float(f"{jac:.6f}"), 6)))
    assert {(a, b) for a, b, _ in got} == {(a, b) for a, b, _ in want}
    assert got  # non-vacuous: planted near-dups found


def test_curation_state_is_a_published_artifact(spark):
    """VERDICT r12 #2: the incremental-APSS stored state is a WAP-published
    parquet artifact, not a session cache — a warm call reads back the
    published tables without republishing, and a changed corpus
    fingerprint triggers a rebuild (new version) while a stale marker
    never serves wrong state."""
    import os

    from etl_expenses_spark.operators.wap import versions
    from etl_expenses_spark.plans._util import state_dir
    from etl_expenses_spark.plans.similarity_ops import _curation_state

    sf_dir = SF_DIR
    root = state_dir("curation_apss", sf_dir)
    import shutil

    shutil.rmtree(root, ignore_errors=True)  # force cold
    docs = load_table(spark, sf_dir, "documents")

    sets1, star1 = _curation_state(spark, docs, sf_dir)
    assert versions(os.path.join(root, "sets")) == [1]
    assert versions(os.path.join(root, "star")) == [1]
    n_sets, n_star = sets1.count(), star1.count()
    assert n_sets == docs.count() and n_star > 0

    # warm: same fingerprint -> NO republish (version list unchanged)
    sets2, star2 = _curation_state(spark, docs, sf_dir)
    assert versions(os.path.join(root, "sets")) == [1]
    assert sets2.count() == n_sets and star2.count() == n_star

    # corpus change -> fingerprint mismatch -> rebuild publishes anew
    grown = docs.limit(50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    ).unionByName(docs)
    sets3, _ = _curation_state(spark, grown, sf_dir)
    assert versions(os.path.join(root, "sets")) == [2]
    assert sets3.count() == n_sets + 50

    # and the original corpus rebuilds again (marker now stale for it)
    sets4, _ = _curation_state(spark, docs, sf_dir)
    assert versions(os.path.join(root, "sets")) == [3]
    assert sets4.count() == n_sets
    shutil.rmtree(root, ignore_errors=True)  # leave no sf0.001 state behind


def test_star_fold_components_equals_full_cc(spark):
    """r13 rep-graph fold: star_fold_components over (star, pairs) must
    equal connected_components(star ∪ pairs) extended with identity labels
    — on an adversarial fixture where delta pairs CHAIN several stored
    components together through shared and fresh nodes, and where a delta
    id is smaller than every stored member of the component it joins."""
    from etl_expenses_spark.operators.dedup import (
        connected_components,
        star_fold_components,
    )

    # stored components: {10,11,12} min 10; {20,21} min 20; {30,31} min 30;
    # {40} singleton (no star rows). Star rows are member -> component min.
    star = spark.createDataFrame(
        [(11, 10), (12, 10), (21, 20), (31, 30)], "src long, dst long"
    )
    # delta pairs: 5 is a NEW node smaller than everything it touches and
    # chains {20,21}–{30,31} via 21—5, 5—31; 12—40 merges a stored member
    # (not the rep) with a bare singleton; 99—98 is delta-only.
    pairs = spark.createDataFrame(
        [(21, 5), (5, 31), (12, 40), (99, 98)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (10, 11, 12, 20, 21, 30, 31, 40, 5, 98, 99, 77)],
        "id long",
    )

    got = {
        r.id: r.cluster_id
        for r in star_fold_components(star, pairs, nodes).collect()
    }

    full_edges = star.unionByName(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    cc = {
        r.id: r.cluster_id for r in connected_components(full_edges).collect()
    }
    want = {r_id: cc.get(r_id, r_id) for r_id in got}
    assert got == want
    # spot-check the interesting semantics
    assert got[20] == got[31] == got[5] == 5  # chained merge, delta id wins
    assert got[10] == got[40] == 10           # member-side merge keeps min
    assert got[98] == 98 and got[99] == 98    # delta-only pair
    assert got[77] == 77                      # untouched node: identity
