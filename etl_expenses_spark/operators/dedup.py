"""Deduplication operators for the LLM-data-pipeline surface (north star).

Four tiers, all shuffle-friendly DataFrame compositions (no Python in the
candidate-generation hot path):

- exact: content-hash groupBy (one shuffle on the 16-byte hash).
- ngram-jaccard: exact pairwise Jaccard within small blocking groups.
- MinHash+LSH: shingle → per-permutation min-hash → banded bucket join —
  the O(n·bands) candidate generation that replaces O(n²) at 100 TB.
- SimHash: token-hash bit-majority signature + chunk-banded candidate join
  with popcount Hamming verification.

The reference has only exact-key dedup (J1-J4); these generalize it per
BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_expenses_spark.functions.text import tokens


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical payloads by md5; canonical id = min id per group."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def token_shingles(col: Column | str, k: int = 3) -> Column:
    """k-token shingles (array<string>); whole doc if shorter than k."""
    t = tokens(col)
    n = F.size(t)
    shingled = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    return F.when(n >= k, shingled).otherwise(F.array(F.concat_ws(" ", t)))


def _salted_hash(i: int):
    """Closure factory — NOTE: pyspark higher-order-function lambdas must
    declare exactly the engine-provided parameters (a 2-arg transform lambda
    receives (element, index)); capturing loop state via default args would
    silently bind the index column instead."""
    return lambda s: F.xxhash64(F.concat(F.lit(f"p{i}_"), s))


def _minhash_sig(shingles: Column, num_perm: int) -> list[Column]:
    """One min-hash per permutation; permutation i = xxhash64 with a distinct
    salt (salting the input is equivalent to an independent hash family here
    and stays 100% JVM-side)."""
    return [
        F.array_min(F.transform(shingles, _salted_hash(i))).alias(f"mh{i}")
        for i in range(num_perm)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash, verified with exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale shape: signatures are narrow (num_perm longs); candidates come from
    a groupBy on (band_idx, band_hash) — data volume after the explode is
    bands× the doc count, not doc²; the exact-Jaccard verify only touches
    bucket collisions.
    """
    rows_per_band = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        token_shingles(text_col, shingle_k).alias("shingles"),
    ).select("id", "shingles", *_minhash_sig(F.col("shingles"), num_perm))
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("id", "shingles", *band_cols)
    exploded = banded.select(
        "id",
        "shingles",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash")) for b in range(bands)])
        ).alias("bh"),
    ).select("id", "shingles", "bh.band_idx", "bh.band_hash")

    a = exploded.alias("a")
    b = exploded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a, sh_b = F.array_distinct("sh_a"), F.array_distinct("sh_b")
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = (F.size(sh_a) + F.size(sh_b)).cast("double") - inter
    return (
        candidates.withColumn("jaccard", inter / F.greatest(union, F.lit(1.0)))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def _simhash60(col: Column | str) -> Column:
    """60-bit SimHash of the whitespace tokens (60 keeps the signature inside
    a positive long under ANSI arithmetic; the 4 dropped bits cost ~nothing
    for near-dup detection). Shift amounts must be Python ints (Spark's
    shiftright takes no Column), hence the literal per-bit loop — Catalyst
    folds it into one codegen'd projection."""
    hashes = F.transform(tokens(col), lambda tok: F.xxhash64(tok))

    def bit_balance(b: int):
        return lambda acc, h: (
            acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
        )

    sig = F.lit(0).cast("long")
    for b in range(60):
        cnt = F.aggregate(hashes, F.lit(0).cast("long"), bit_balance(b))
        sig = sig + F.when(cnt > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidates via 4-way chunk banding (pigeonhole: distance ≤3 ⇒ at least
    one 15-bit chunk identical), verified with popcount on XOR. Same
    bucket-join scale shape as MinHash-LSH.
    """
    sigs = df.select(F.col(id_col).alias("id"), _simhash60(text_col).alias("sig"))
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(F.col("sig"), c * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", "ch.chunk_idx", "ch.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
