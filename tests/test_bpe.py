"""BPE trainer semantics: the merge sequence on a hand-computable corpus
matches the textbook algorithm; segmentation is consistent with training;
the distributed pipeline is deterministic."""

from __future__ import annotations

from pyspark.sql import Row

from etl_expenses_spark.operators.bpe import (
    END,
    bpe_segment,
    segment_words,
    train_bpe,
    word_counts,
)


def _corpus(spark):
    # "low" x5, "lower" x2, "newest" x6, "widest" x3 — the Sennrich paper's
    # canonical example corpus.
    rows = [
        Row(doc_id=1, text=" ".join(["low"] * 5 + ["lower"] * 2)),
        Row(doc_id=2, text=" ".join(["newest"] * 6 + ["widest"] * 3)),
    ]
    return spark.createDataFrame(rows)


def test_word_counts_distributed(spark):
    counts = {r.word: r.n for r in word_counts(_corpus(spark)).collect()}
    assert counts == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_merge_sequence_matches_textbook(spark):
    """First merges on the canonical corpus: 'es' (9 = 6+3), then 'est' (9),
    then 'est</w>' (9), then 'lo' (7 = 5+2) — the exact sequence from the
    original BPE paper example (frequency ties broken lexicographically)."""
    merges = train_bpe(_corpus(spark), n_merges=4)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
    ]


def test_segmentation_uses_trained_merges(spark):
    merges = train_bpe(_corpus(spark), n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # a trained word segments into few pieces; an unseen word falls back
    # to characters (plus any merges that happen to apply)
    newest = segment_words("newest", ranks)
    assert "est" + END in ("".join(newest)) or newest[-1].endswith(END)
    assert len(newest) <= 3
    unseen = segment_words("zzz", ranks)
    assert unseen == ["z", "z", "z", END]


def test_bpe_pipeline_deterministic(spark):
    d = _corpus(spark)
    merges1 = train_bpe(d, n_merges=8)
    merges2 = train_bpe(d, n_merges=8)
    assert merges1 == merges2

    out1 = {r.doc_id: (r.n_words, r.n_pieces, tuple(r.first_word_pieces))
            for r in bpe_segment(d, merges1).collect()}
    out2 = {r.doc_id: (r.n_words, r.n_pieces, tuple(r.first_word_pieces))
            for r in bpe_segment(d, merges2).collect()}
    assert out1 == out2
    assert out1[1][0] == 7 and out1[2][0] == 9
    # more merges => piece counts can only shrink or hold
    few = bpe_segment(d, merges1[:2]).collect()
    many = bpe_segment(d, merges1).collect()
    few_n = {r.doc_id: r.n_pieces for r in few}
    many_n = {r.doc_id: r.n_pieces for r in many}
    assert all(many_n[k] <= few_n[k] for k in few_n)
