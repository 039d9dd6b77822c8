"""Suffix-array tier (variable-length maximal repeats) vs a naive
independent reference.

The reference computes, for every position of every doc, the true longest
duplicated-prefix length by brute-force comparison against every other
position in the corpus — O(N² · match) and algorithm-free, so agreement
with the distributed range-sorted-adjacency implementation is meaningful.
"""

from __future__ import annotations

import pytest

from etl_expenses_spark.plans.dedup_ops import (
    _SA_CAP,
    _SPAN_L,
    _suffix_match_lens,
)


def naive_match_lens(texts: dict, L: int, cap: int) -> dict:
    """{(doc_id, 1-based pos): match_len} for every position whose true
    longest duplicated prefix is >= L, capped at `cap`."""
    suffixes = []  # (doc_id, pos0, suffix)
    for did, t in texts.items():
        for i in range(len(t) - L + 1):
            suffixes.append((did, i, t[i:]))
    out = {}
    for did, i, s in suffixes:
        best = 0
        for did2, j, s2 in suffixes:
            if (did, i) == (did2, j):
                continue
            k = 0
            m = min(len(s), len(s2))
            while k < m and s[k] == s2[k]:
                k += 1
            best = max(best, k)
        if best >= L:
            out[(did, i + 1)] = min(best, cap)
    return out


@pytest.fixture()
def make_docs(spark, tmp_path):
    def _make(texts: dict) -> str:
        df = spark.createDataFrame(
            [(k, v, "src", 0.5, "en") for k, v in texts.items()],
            "doc_id long, text string, source string, quality double, lang string",
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        return str(tmp_path)

    return _make


def _spark_match_lens(spark, sf_dir):
    rows = _suffix_match_lens(spark, sf_dir).collect()
    return {(r["doc_id"], r["p"]): r["match_len"] for r in rows}


def test_match_lens_cross_doc_and_within_doc(spark, make_docs):
    L = _SPAN_L
    rep = "x" * 10 + "the quick brown fox jumps over the lazy dog " * 3
    assert len(rep) > L
    texts = {
        1: "A" * 7 + rep + "unique tail one " * 5,
        2: "completely different head material " * 3 + rep + "B" * 9,
        # within-doc repeat: the same block twice in one document
        3: rep + "spacer block 123456 " * 4 + rep,
        # no duplication at all
        4: "nothing here repeats anywhere in this corpus at all " * 4,
    }
    sf_dir = make_docs(texts)
    got = _spark_match_lens(spark, sf_dir)
    want = naive_match_lens(texts, L, _SA_CAP)
    assert got == want


def test_match_lens_overlapping_and_nested_repeats(spark, make_docs):
    L = _SPAN_L
    # periodic text: every window of the period is duplicated; heavy overlap
    period = "abcdefghij"
    texts = {
        1: period * 20,                      # self-similar, many matches
        2: period * 8 + "Z" + period * 5,    # interrupted periodicity
        3: "m" * (L + 25),                   # unary run: maximal overlap
    }
    sf_dir = make_docs(texts)
    got = _spark_match_lens(spark, sf_dir)
    want = naive_match_lens(texts, L, _SA_CAP)
    assert got == want


def test_match_len_cap_applies(spark, make_docs):
    # a shared block much longer than the cap: true match exceeds _SA_CAP,
    # reported value must be exactly _SA_CAP
    block = "abcdefghijklmnopqrstuvwxyz0123456789" * 20  # 720 chars
    assert len(block) > _SA_CAP
    texts = {1: block + "tailA", 2: block + "tailB"}
    sf_dir = make_docs(texts)
    got = _spark_match_lens(spark, sf_dir)
    assert got[(1, 1)] == _SA_CAP
    assert got[(2, 1)] == _SA_CAP
    want = naive_match_lens(texts, _SPAN_L, _SA_CAP)
    assert got == want


def test_sa_spans_equal_gram_spans(spark, make_docs):
    """The two structurally different algorithms must produce identical
    merged spans (the property the shared oracle relies on)."""
    from etl_expenses_spark.plans.dedup_ops import (
        dedup_exact_duplicated_spans,
        dedup_spans_suffix_array,
    )

    rep1 = "shared paragraph that appears in many documents verbatim " * 2
    rep2 = "another, different duplicated run 0123456789 " * 2
    texts = {
        1: "intro " * 4 + rep1 + " middle " * 3 + rep2,
        2: rep2 + " unrelated filler text between the runs " + rep1,
        3: rep1 + rep1,          # adjacent copies: spans must merge
        4: "clean document with no duplicated runs whatsoever " * 3,
    }
    sf_dir = make_docs(texts)
    a = sorted(map(tuple, dedup_exact_duplicated_spans(spark, sf_dir).collect()))
    b = sorted(map(tuple, dedup_spans_suffix_array(spark, sf_dir).collect()))
    assert a == b
    assert a  # non-vacuous: the planted repeats produced spans
