"""Distributed BPE tokenizer training (north star: training-data pipeline).

The classic byte-pair-encoding trainer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") has two
very different halves at 100 TB:

- the CORPUS half — word frequency counting — is a full-corpus
  explode→hash-aggregate. That runs distributed here (one shuffle keyed
  by word; the same shape as term frequencies in plans/text_ops.py).
- the MERGE half — iteratively fusing the most frequent adjacent symbol
  pair — operates on the word-frequency VOCABULARY, whose cardinality is
  bounded (≈100k-10M types even for web-scale corpora; Heaps' law), not
  on the corpus. It runs on the driver over the collected vocab, exactly
  like every production BPE trainer (HuggingFace tokenizers, SentencePiece
  train on counts, not raw text). The docstring contract: callers must
  cap the vocab (``max_vocab``) so the collect is bounded by design.

Segmentation (applying trained merges to the corpus) is distributed
again: an Arrow-batched pandas UDF with the merge ranks broadcast.

Determinism: ties in pair frequency break lexicographically, so the merge
sequence — and therefore every downstream token count — is identical
across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word sentinel, the standard BPE word boundary marker


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-scale word frequency table — the distributed half of BPE
    training. One explode + one hash aggregate."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for symbols, n in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    fused = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, n in vocab.items():
        merged: list[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                merged.append(fused)
                i += 2
            else:
                merged.append(symbols[i])
                i += 1
        key = tuple(merged)
        out[key] = out.get(key, 0) + n
    return out


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    max_vocab: int = 100_000,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges: distributed word counting, then the
    driver-side merge loop over the bounded vocabulary (top ``max_vocab``
    words by (count desc, word) — a deterministic cap, so a corpus with
    pathological type growth degrades by dropping rare types, never by
    unbounded driver memory)."""
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.col("n").desc(), "word")
        .limit(max_vocab)
        .collect()
    )
    vocab = {tuple(r["word"]) + (END,): r["n"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # max by (count, then lexicographically SMALLEST pair): deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def segment_words(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word (greedy lowest-rank-first — the
    standard BPE inference order)."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE segmentation: doc → subword piece count + pieces of
    the first word (the fertility diagnostic a tokenizer report shows).
    Arrow-batched; the merge table rides to executors as a broadcast
    closure (tiny: n_merges entries)."""
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("n_pieces", T.IntegerType()),
            T.StructField("first_word_pieces", T.ArrayType(T.StringType())),
        ]
    )

    def gen(batches):
        for b in batches:
            ids, n_words, n_pieces, firsts = [], [], [], []
            for did, text in zip(b[id_col], b[text_col]):
                words = [w for w in str(text).split(" ") if w]
                total = 0
                for w in words:
                    total += len(segment_words(w, ranks))
                ids.append(did)
                n_words.append(len(words))
                n_pieces.append(total)
                firsts.append(segment_words(words[0], ranks) if words else [])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words,
                    "n_pieces": n_pieces,
                    "first_word_pieces": firsts,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, schema=out_schema)
