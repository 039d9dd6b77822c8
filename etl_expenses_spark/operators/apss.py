"""All-pairs similarity search (APSS) and containment dedup over sparse
token vectors — the exact-threshold similarity-join tier that needs neither
LSH recall tuning nor a natural blocking key.

Two operators, both built on an inverted index (explode → join on term →
re-aggregate) so no doc pair is ever formed unless it demonstrably shares a
term that *could* push it over the threshold:

- ``allpairs_cosine_prefix``: Bayardo/Roberts prefix filtering ("Scaling Up
  All Pairs Similarity Search", WWW'07). Each document indexes only its
  *prefix* — the rarest terms holding just over (1 - t²) of its squared L2
  mass — because a pair whose shared terms all fall in either side's suffix
  has cosine ≤ ‖suffix‖/‖doc‖ < t by Cauchy-Schwarz and can be skipped
  without looking at it. Candidates come from joining prefix postings
  against full postings; an exact integer-dot verify join then removes
  false positives, so the output is *exactly* the ≥ t pair set (the DuckDB
  n² oracle checks this). At 100 TB the prefix keeps posting lists short
  precisely where document frequency is high: a term enters prefixes only
  for the few documents where it is rare-side mass, so Σ|posting|² stays
  near-linear; the verify join touches candidates only.

- ``containment_pairs_inverted``: directional shingle containment
  C(a→b) = |S(a) ∩ S(b)| / |S(a)| — catches quote/wrapper/superset
  duplicates that symmetric Jaccard under-scores (a 50-line doc fully
  embedded in a 5000-line doc has Jaccard ≈ 0.01 but containment 1.0).
  Intersections come from one join on (block, shingle) + one count
  aggregate — each posting row crosses the shuffle once and pairs
  materialize only for docs that actually share a shingle inside a
  blocking group.

Reference scope: the reference engine's dedup surface is whole-row
(`/root/reference/etl_whatsapp_gasto_grupal/lambda_function.py:61` —
drop_duplicates on the message frame); threshold similarity joins are part
of this repo's training-data-pipeline extension, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_expenses_spark.caching import tracked_persist
from etl_expenses_spark.functions.text import tokens


def term_frequencies(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, term, f) long-format TF vectors — lowercase whitespace tokens,
    integer counts (exact, associative; both engines sum them identically)."""
    return (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def allpairs_cosine_prefix(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact cosine-similarity self-join: every unordered pair with
    cos(a, b) ≥ threshold over integer TF vectors, no pair enumerated
    unless it survives the prefix filter.

    Plan shape (all JVM-side, three shuffles on bounded relations):
      1. TF + per-doc squared norm (two hash aggregates, partial map-side).
      2. Prefix marking: global document frequency per term (one agg,
         broadcast back is wrong at scale — it's a plain join), then a
         per-doc cumulative sum of f² ordered by (df asc, term) — a window
         partitioned BY DOC, so no global sort; a term is in the prefix
         while the mass before it is ≤ (1 - t²)·‖doc‖² (inclusive boundary:
         the skip bound needs strict cos < t).
      3. Candidates: prefix postings ⋈ full postings on term (doc ids
         differ), canonicalized to (least, greatest), distinct.
      4. Verify: exact integer dot via TF re-join, cos = dot /
         (‖a‖·‖b‖) in double — identical IEEE ops to the oracle, then
         quantized to 1e-6 for hash stability.
    """
    tf = tracked_persist(term_frequencies(docs, text_col, id_col))
    norms = tf.groupBy("id").agg(F.sum(F.col("f") * F.col("f")).alias("n2"))

    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("id").orderBy("df", "term").rowsBetween(
        W.unboundedPreceding, -1
    )
    marked = (
        tf.join(df_tbl, "term")
        .join(norms, "id")
        .withColumn("mass_before", F.coalesce(F.sum(F.col("f") * F.col("f")).over(w),
                                              F.lit(0)))
        .withColumn(
            "in_prefix",
            F.col("mass_before").cast("double")
            <= (1.0 - threshold * threshold) * F.col("n2").cast("double"),
        )
    )
    prefix = marked.filter("in_prefix").select(
        F.col("id").alias("pid"), "term"
    )
    cands = (
        prefix.join(tf.select(F.col("id").alias("qid"), "term"), "term")
        .filter(F.col("pid") != F.col("qid"))
        .select(
            F.least("pid", "qid").alias("id_a"),
            F.greatest("pid", "qid").alias("id_b"),
        )
        .distinct()
    )
    dots = (
        cands.join(tf.select(F.col("id").alias("id_a"), "term",
                             F.col("f").alias("fa")), "id_a")
        .join(tf.select(F.col("id").alias("id_b"), "term",
                        F.col("f").alias("fb")), ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("fa") * F.col("fb")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("n2_b"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("n2_a").cast("double")) * F.sqrt(F.col("n2_b").cast("double"))
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.col("cos_raw").cast("decimal(18,6)").cast("double").alias("cos_sim"),
        )
    )


def containment_pairs_inverted(
    docs: DataFrame,
    threshold: float,
    k: int = 3,
    block_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Directional containment pairs inside blocking groups: for docs a ≠ b
    sharing ≥ 1 distinct k-token shingle within the same ``block_col``
    value, emit (contained, container) rows where
    |S(a) ∩ S(b)| / |S(a)| ≥ threshold.

    Inverted-index formulation: distinct (block, shingle, doc) postings,
    self-joined on (block, shingle) and re-aggregated — intersections
    without an array cross-product, each posting crossing the shuffle once.
    Posting lists are bounded by within-block document frequency; at 100 TB
    a df-cap (drop shingles present in > X% of a block — they carry no
    containment signal alone) bounds Σ|posting|² the same way the banded
    MinHash tier bounds its buckets.
    """
    from etl_expenses_spark.operators.dedup import shingles_of_tokens

    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    ).filter(F.size("toks") >= k)
    postings = base.select(
        "id", "blk",
        F.explode(F.array_distinct(shingles_of_tokens(F.col("toks"), k))).alias(
            "shingle"
        ),
    )
    postings = tracked_persist(postings)
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        postings.alias("a")
        .join(
            postings.select(F.col("id").alias("id_b"), "blk", "shingle").alias("b"),
            ["blk", "shingle"],
        )
        .filter(F.col("a.id") != F.col("id_b"))
        .groupBy(F.col("a.id").alias("id_small"), F.col("id_b").alias("id_big"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    cont = F.col("n_inter").cast("double") / F.col("n_small").cast("double")
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_small"),
                         F.col("n_shingles").alias("n_small")),
            "id_small",
        )
        .withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select(
            "id_small",
            "id_big",
            F.col("n_small").alias("n_shingles_small"),
            "n_inter",
            F.col("containment").cast("decimal(18,6)").cast("double").alias(
                "containment"
            ),
        )
    )
