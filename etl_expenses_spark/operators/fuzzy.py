"""Blocked fuzzy matching (entity resolution) via candidate blocking +
edit-distance verification.

The naive fuzzy self-join (`levenshtein(a.name, b.name) <= k` with no equi
key) is a cartesian product — O(n²) comparisons and a cluster-killer at
100 TB. The classic scale-safe shape (same family as the n-gram Jaccard
blocker in `operators/dedup.py`): derive a cheap deterministic *blocking
key* from each string (first token, soundex, prefix, …), equi-join on the
block — a plain shuffled hash join — and run the expensive edit-distance
verify only on candidate pairs inside a block. Comparison cost drops from
n² to Σ|block|²; recall is bounded by the blocker (a pair split across
blocks is never compared), which is the standard, documented trade.

Reference tie-in: the reference reconciles near-identical merchant /
concept strings across report formats by normalizing then exact-matching
(`/root/reference/transform_data_mp/lambda_function.py:70-84`); this
operator is the scale generalization where normalization alone can't make
variants collide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_dist: int,
) -> DataFrame:
    """All pairs (a, b) with ``a.id < b.id``, equal blocking key, and
    ``levenshtein(a.text, b.text) <= max_dist``.

    ``block`` is evaluated against ``df``'s columns (e.g.
    ``F.split(F.col("name"), " ")[0]`` or ``F.soundex("name")``). Output
    columns: id_a, text_a, id_b, text_b, dist.

    Scale notes: one shuffle on the block key; per-block work is |block|²
    string compares, so the caller must choose a blocker with bounded block
    sizes (document cardinality like any blocked near-dup). Levenshtein is
    a JVM builtin — no Python in the hot path.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        block.alias("__blk"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        block.alias("__blk"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= F.lit(int(max_dist)))
        .drop("__blk")
    )


def fuzzy_join_best_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    block_left: Column,
    block_right: Column,
    max_dist: int,
) -> DataFrame:
    """For each left row, its single best fuzzy match on the right (lowest
    edit distance, ties broken by right id) within the same block.

    The two-sided analog of :func:`blocked_fuzzy_pairs` — the shape of
    "match incoming dirty records against a canonical dimension". One
    shuffle on the block key + one shuffle for the per-left-row argmin
    (min_by is a partial-aggregatable JVM builtin, so the reduction is
    map-side combined).
    """
    l = left.select(
        F.col(left_id).alias("l_id"),
        F.col(left_text).alias("l_text"),
        block_left.alias("__blk"),
    )
    r = right.select(
        F.col(right_id).alias("r_id"),
        F.col(right_text).alias("r_text"),
        block_right.alias("__blk"),
    )
    cand = (
        l.join(r, "__blk")
        .withColumn("dist", F.levenshtein("l_text", "r_text"))
        .filter(F.col("dist") <= F.lit(int(max_dist)))
    )
    # argmin via min_by on a sortable (dist, r_id) struct — deterministic ties
    best = cand.groupBy("l_id", "l_text").agg(
        F.min_by(F.struct("r_id", "r_text", "dist"), F.struct("dist", "r_id")).alias("m")
    )
    return best.select(
        "l_id",
        "l_text",
        F.col("m.r_id").alias("match_id"),
        F.col("m.r_text").alias("match_text"),
        F.col("m.dist").alias("dist"),
    )
