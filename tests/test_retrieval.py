"""Semantic invariants of the retrieval/ranking/centrality surface.

Cross-engine value equality is the oracle gate's job (check_oracle.py);
these tests pin the *semantics*: BM25 only scores matching docs, PageRank
conserves rank mass, the bigram model lower-bounds rarity, the rules filter
is the conjunction of its flags, and the inverted index is self-consistent.
"""

from __future__ import annotations

from etl_expenses_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_inverted_index_self_consistent(spark):
    rows = REGISTRY["inverted_index_postings"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # postings is a comma-joined sorted id string (driver-sortable).
        ids = [int(d) for d in r.postings.split(",")]
        assert r.df == len(ids)
        assert ids == sorted(set(ids))
        assert all(d < 100 for d in ids)


def test_bm25_topk_scores_and_membership(spark):
    from etl_expenses_spark.plans.retrieval_ops import _BM25_QUERIES

    rows = REGISTRY["bm25_topk_per_query"].build(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {q for q, _ in _BM25_QUERIES}
    terms = {}
    for q, t in _BM25_QUERIES:
        terms.setdefault(q, set()).add(t)
    docs = {
        r.doc_id: set((r.text or "").lower().split())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for q, hits in by_q.items():
        assert len(hits) <= 10
        for h in hits:
            assert h.score_micro > 0
            # a scored doc must contain at least one query term
            assert docs[h.doc_id] & terms[q], (q, h.doc_id)


def test_pagerank_mass_conservation(spark):
    rows = REGISTRY["pagerank_copurchase"].build(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    total = sum(r.rank_micro for r in rows)
    # Exact arithmetic would conserve n * 1e6 exactly; integer-division
    # truncation can only LOSE mass, bounded by ~1 unit per edge per round.
    assert total <= n * 1_000_000
    assert total >= int(n * 1_000_000 * 0.99)
    assert all(r.rank_micro >= 150_000 for r in rows)


def test_bigram_rarity_lower_bound(spark):
    rows = REGISTRY["lm_bigram_rarity"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # c(w1,.) >= c(w1,w2)  =>  every bigram's rarity >= 1e6
        assert r.rarity_micro_sum >= 1_000_000 * r.n_bigrams
        assert abs(r.avg_rarity - r.rarity_micro_sum / r.n_bigrams) < 1e-9
    # n_bigrams == n_tokens - 1 for every doc with >= 2 tokens
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ntok = {d.doc_id: len(d.text.split()) for d in docs}
    got = {r.doc_id: r.n_bigrams for r in rows}
    for doc_id, n in ntok.items():
        if n >= 2:
            assert got[doc_id] == n - 1


def test_quality_rules_conjunction(spark):
    rows = REGISTRY["quality_filter_rules"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.passes == (r.r_length and r.r_word_len and r.r_punct and r.r_digit)


def test_substring_windows_find_planted_overlap(spark):
    # Any returned pair must genuinely share a >= 40-char verbatim run;
    # verify by brute force on the small corpus.
    rows = REGISTRY["dedup_substring_windows"].build(spark, SF_DIR).collect()
    docs = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for r in rows:
        a, b = docs[r.doc_a], docs[r.doc_b]
        wins = {a[p : p + 40] for p in range(0, len(a) - 39, 10)}
        assert any(w in b for w in wins), (r.doc_a, r.doc_b)


def test_collapse_token_runs_idempotent_and_correct(spark):
    rows = REGISTRY["text_collapse_token_runs"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        toks = r.cleaned_text.split()
        assert len(toks) == r.n_after <= r.n_before
        # no adjacent repeats remain (idempotence)
        assert all(x != y for x, y in zip(toks, toks[1:]))
