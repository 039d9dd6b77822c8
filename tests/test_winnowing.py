"""Winnowing fingerprints (plans/dedup_ops.py:winnowing_shared_fingerprints).

Pins the SIGMOD'03 guarantee the query relies on: with k-gram size 3 and
window 4, any shared token run of length >= k + w - 1 = 6 selects at least
one common fingerprint in both documents.
"""

from __future__ import annotations

import hashlib


def _fingerprints(words: list[str], k: int = 3, w: int = 4) -> set[int]:
    """Sequential reference of the query's array pipeline."""
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    ]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_shared_run_of_6_tokens_shares_a_fingerprint():
    run = "the quick brown fox jumps high".split()  # 6 tokens
    doc_a = "alpha beta gamma".split() + run + "delta epsilon zeta".split()
    doc_b = "one two three four".split() + run + "five six".split()
    assert _fingerprints(doc_a) & _fingerprints(doc_b)


def test_disjoint_docs_share_nothing():
    doc_a = "a b c d e f g h i j".split()
    doc_b = "k l m n o p q r s t".split()
    assert not _fingerprints(doc_a) & _fingerprints(doc_b)


def test_query_matches_sequential_reference(spark):
    from pyspark.sql import functions as F

    from etl_expenses_spark.plans.registry import REGISTRY
    from tests.conftest import SF_DIR

    got = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in REGISTRY["winnowing_shared_fingerprints"]
        .build(spark, SF_DIR)
        .collect()
    }
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.lower("text").alias("text"))
        .collect()
    )
    fps = {
        d.doc_id: _fingerprints(d.text.split())
        for d in docs
        if len(d.text.split()) >= 6
    }
    # common-fingerprint filter: drop fps present in > 64 docs
    from collections import Counter

    freq = Counter(fp for s in fps.values() for fp in s)
    fps = {i: {fp for fp in s if freq[fp] <= 64} for i, s in fps.items()}
    ids = sorted(fps)
    expected = {}
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            n = len(fps[a] & fps[b])
            if n >= 3:
                expected[(a, b)] = n
    assert got == expected
