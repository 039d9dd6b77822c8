"""Core relational surface (SURVEY.md §2.3-§2.8).

Every operator family the reference exercises — projections/filters (P1-P9),
the anti-join idempotency core (J1-J4), the latent AI-agent join/aggregate
surface (J5/A6), sorts + top-k (O1-O2), set ops, and the window functions the
engine adds for latest-per-key semantics — each as a DataFrame plan with a
DuckDB oracle twin.

Scale notes are inline per query: what shuffles, what broadcasts, what prunes.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_expenses_spark.plans._util import T, dec, dsum
from etl_expenses_spark.plans.registry import query


# --------------------------------------------------------------------------
# Flagship: the AI agent's "spend by category" shape
# (`/root/reference/ai_agent/lambda_function.py:218`): fact scan with a
# pushed-down date filter → broadcast dim join → hash agg → top-k.
# At 100 TB: lineitem is the 100 TB side; part is a dim → broadcast join, no
# fact shuffle until the (tiny, post-agg) exchange on p_brand; TakeOrdered
# replaces a global sort.
# --------------------------------------------------------------------------
@query(
    "flagship_spend_by_category",
    oracle="""
        SELECT p.p_brand AS category,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS total_spend,
               COUNT(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
        GROUP BY p.p_brand
        ORDER BY total_spend DESC, category
        LIMIT 20
    """,
    tags=("flagship", "join", "agg", "topk"),
)
def flagship_spend_by_category(spark, sf_dir):
    """Flagship: dated lineitem scan -> broadcast part-dim join -> spend by category, top-20. Pushed date filter, hash agg, TakeOrderedAndProject."""
    lineitem = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1998-01-01")
    part = T(spark, sf_dir, "part")
    # decimal-domain money math: inputs are clean 2-decimal values, so the
    # casts are exact and the whole aggregate is exact in both engines
    spend = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("category"))
        .agg(
            F.sum(spend).cast("double").alias("total_spend"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("category"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q1 shape: the grouped-aggregation workhorse. Map-side partial
# aggregation (5 distinct group keys) means the shuffle carries ~5 rows per
# task regardless of input size — the canonical scale-safe aggregate.
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))
                        * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
                   AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full-scan hash aggregate over line status groups, decimal-exact sums surfaced as doubles."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    charge = disc_price * (F.lit(1) + dec("l_tax", 2, 3))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        (dsum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# Projections / filters
# --------------------------------------------------------------------------
@query(
    "derived_columns",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(9,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2))) * 100) AS DOUBLE) / 100.0
                   AS gross,
               CAST(FLOOR(CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(9,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2))) * 100) AS DOUBLE) / 100.0
                          * CAST(0.3 AS DOUBLE) * 100.0) AS DOUBLE) / 100.0
                   AS meli_fee
        FROM lineitem
    """,
    tags=("projection",),
)
def derived_columns(spark, sf_dir):
    """P1/P2/F15: the per-ticket derived amounts
    (`/root/reference/transform_data_pdf/lambda_function.py:123-126`):
    gross = price net of discount, fee = 30% cut, truncated to cents.
    Cent handling is floor-based: Spark rounds decimal ties HALF_UP while
    DuckDB rounds HALF_EVEN, so any tie-producing rounding is banned in
    oracle-checked plans; FLOOR over exact decimal products is tie-free.
    Pure narrow projection — no shuffle at any scale."""
    gross_dec = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    gross = F.floor(gross_dec * 100).cast("double") / F.lit(100.0)
    fee = F.floor(gross * F.lit(0.3) * F.lit(100.0)).cast("double") / F.lit(100.0)
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        gross.alias("gross"),
        fee.alias("meli_fee"),
    )


@query(
    "filter_events_threshold",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_type IN ('purchase', 'view')
          AND value > 100.0
          AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    tags=("filter", "json"),
)
def filter_events_threshold(spark, sf_dir):
    """P3/P4/P6 + F19: membership + numeric threshold + JSON field predicate.
    All three reach the parquet scan as pushed filters (json extraction
    excepted — that evaluates post-scan, still codegen'd)."""
    e = T(spark, sf_dir, "events")
    return e.filter(
        F.col("event_type").isin("purchase", "view")
        & (F.col("value") > 100.0)
        & (F.get_json_object("props", "$.k").cast("long") > 50)
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "required_fields_filter",
    oracle="""
        SELECT doc_id, lang, source
        FROM documents
        WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
          AND n_chars > 0
    """,
    tags=("filter",),
)
def required_fields_filter(spark, sf_dir):
    """P7: drop rows missing required fields — the mail-row gate at
    `/root/reference/transform_data_bank_pay/lambda_function.py:49-51`."""
    return (
        T(spark, sf_dir, "documents")
        .na.drop(subset=["text", "lang", "source"])
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "source")
    )


@query(
    "conditional_mapping",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderpriority LIKE '1%' THEN 'critical'
                    WHEN o_orderpriority LIKE '2%' THEN 'high'
                    WHEN o_orderpriority LIKE '3%' THEN 'medium'
                    ELSE 'low' END AS priority_class
        FROM orders
    """,
    tags=("projection", "case"),
)
def conditional_mapping(spark, sf_dir):
    """P9: chained conditional value mapping (the currency classifier at
    `/root/reference/transform_data_bank_pay/lambda_function.py:35`)."""
    p = F.col("o_orderpriority")
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(p.startswith("1"), "critical")
        .when(p.startswith("2"), "high")
        .when(p.startswith("3"), "medium")
        .otherwise("low")
        .alias("priority_class"),
    )


# --------------------------------------------------------------------------
# Joins. J1-J4 (anti-join idempotency) + the latent J5 surface.
# Dim joins broadcast; fact-fact joins shuffle on the key — at 100 TB the
# orders⋈customer join shuffles both sides unless bucketed, which io.py's
# gold layout provides.
# --------------------------------------------------------------------------
@query(
    "join_inner_orders_customer",
    oracle="""
        SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("join",),
)
def join_inner_orders_customer(spark, sf_dir):
    """J5 inner equi join orders x customer on the shuffled custkey."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_dims_agg",
    oracle="""
        SELECT r.r_name, n.n_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def join_dims_agg(spark, sf_dir):
    """Snowflake dim chain — both dims broadcast (nation/region are KBs even
    at SF100k), so the fact side never shuffles for the join."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "join_left_order_counts",
    oracle="""
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    tags=("join", "agg"),
)
def join_left_order_counts(spark, sf_dir):
    """J5 left join preserving order-less customers, counting per customer."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_big_spenders",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
    """,
    tags=("join", "semi"),
)
def join_semi_big_spenders(spark, sf_dir):
    """LEFT SEMI: customers having a qualifying order; no fan-out, key-only probe side."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti_customers_without_orders(spark, sf_dir):
    """The reference's signature operator: left_anti as set-membership dedup
    (J1-J4, `/root/reference/load_data/lambda_function.py:39-73,164-200`)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_full_outer_nation_activity",
    oracle="""
        SELECT COALESCE(cn.k, sn.k) AS nationkey,
               COALESCE(cn.n_cust, 0) AS n_cust,
               COALESCE(sn.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) cn
        FULL OUTER JOIN
             (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) sn
        ON cn.k = sn.k
    """,
    tags=("join", "outer"),
)
def join_full_outer_nation_activity(spark, sf_dir):
    """FULL OUTER join of two per-nation aggregates; null-safe totals on both sides."""
    cn = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, "k", "full_outer").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# --------------------------------------------------------------------------
# Aggregations beyond the basics
# --------------------------------------------------------------------------
@query(
    "agg_order_stats",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_order_stats(spark, sf_dir):
    """A3/A4: count/min/max/sum/avg per order priority; sums in the decimal domain so both engines agree bit-exactly."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum("o_totalprice").alias("total_price"),
            (dsum("o_totalprice") / F.count(F.lit(1))).alias("avg_price"),
        )
    )


@query(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    tags=("agg", "distinct"),
)
def distinct_segments(spark, sf_dir):
    """A2: SELECT DISTINCT — the reference's dedup-key read
    (`/root/reference/load_data/lambda_function.py:41-44`)."""
    return T(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "count_distinct_suppliers",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def count_distinct_suppliers(spark, sf_dir):
    """A4+: exact COUNT(DISTINCT) per nation -- two-level hash agg (dedup then count), the scale-safe distinct plan."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "approx_count_distinct_parts",
    # Computed BOUND-CHECK oracle (r11, VERDICT r10 #2 — replaces the
    # golden literal): the sketch estimate itself is implementation-
    # defined, so the query emits the exact distinct count (independently
    # computable) plus whether the HLL++ estimate landed within 5x its
    # configured 1% relative standard deviation — a semantic guarantee
    # DuckDB can predict TRUE for, rather than a pinned magic number.
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact_parts,
               TRUE AS approx_within_5pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def approx_count_distinct_parts(spark, sf_dir):
    """HLL++ sketch vs exact COUNT(DISTINCT) in one pass — the scale path
    for distinct counting (single pass, no shuffle explosion) checked
    against its own ground truth: output carries the exact count and a
    boolean pinning the estimate within 5% of it (5x the configured 1%
    rsd — a deterministic fact on fixed data, so the oracle computes the
    exact count and predicts TRUE). At 100 TB you drop the exact column
    and keep the sketch; here the pair IS the correctness evidence."""
    from etl_expenses_spark.functions.bounds import rel_err_within

    approx = F.approx_count_distinct("l_partkey", 0.01)
    exact = F.count_distinct("l_partkey").cast("bigint")
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            exact.alias("n_exact_parts"),
            rel_err_within(approx, exact, 0.05).alias("approx_within_5pct"),
        )
    )


@query(
    "rollup_spend",
    oracle="""
        SELECT n.n_name, c.c_mktsegment,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
               COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
    tags=("agg", "rollup"),
)
def rollup_spend(spark, sf_dir):
    """ROLLUP month -> (month, priority) spend hierarchy in a single pass."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            dsum("o_totalprice").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "cube_lineitem_status",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def cube_lineitem_status(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all four grouping-set combinations in one shuffle."""
    return (
        T(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "agg_watermark_max_date",
    oracle="SELECT CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS max_fecha FROM orders",
    tags=("agg", "incremental"),
)
def agg_watermark_max_date(spark, sf_dir):
    """A1: the incremental-extraction watermark read — MAX(TO_DATE(...))
    (`/root/reference/extract_data_pdf/lambda_function.py:56-78`). On a
    date-partitioned gold table this is a metadata-only scan."""
    return T(spark, sf_dir, "orders").agg(
        F.max(F.to_date("o_orderdate")).alias("max_fecha")
    )


# --------------------------------------------------------------------------
# Windows (SURVEY.md §2.6)
# --------------------------------------------------------------------------
@query(
    "window_latest_order_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) t
        WHERE rn = 1
    """,
    tags=("window",),
)
def window_latest_order_per_customer(spark, sf_dir):
    """Latest-per-key via row_number — replaces the reference's 'list is
    already newest-first' assumption
    (`/root/reference/extract_data_mp/lambda_function.py:102-104`, O1)."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        T(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "window_running_user_spend",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
               LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
               LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        FROM events
    """,
    tags=("window",),
)
def window_running_user_spend(spark, sf_dir):
    """Running per-user spend: sum over an unbounded-preceding row frame, one shuffle on user_id."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(run).cast("double").alias("running_spend"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_rank_parts_by_price",
    oracle="""
        SELECT p_partkey, p_brand,
               CAST(RANK() OVER (PARTITION BY p_brand
                                 ORDER BY p_retailprice DESC) AS INTEGER)
                 AS price_rank,
               CAST(DENSE_RANK() OVER (PARTITION BY p_brand
                                       ORDER BY p_retailprice DESC) AS INTEGER)
                 AS price_dense_rank
        FROM part
    """,
    tags=("window",),
)
def window_rank_parts_by_price(spark, sf_dir):
    """rank()/dense_rank() of parts by price within brand, deterministic tiebreak."""
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return T(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


# --------------------------------------------------------------------------
# Sorts / top-k / set ops
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("topk",),
)
def topk_orders(spark, sf_dir):
    """O2: ORDER BY + LIMIT (the agent's 20-row cap). Spark plans this as
    TakeOrderedAndProject — per-partition heaps + driver merge, never a
    global sort. The o_orderkey tiebreaker makes the selection total."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "union_ledger",
    oracle="""
        SELECT o_custkey AS actor_id, 'order' AS src FROM orders
        UNION ALL
        SELECT user_id AS actor_id, 'event' AS src FROM events
    """,
    tags=("setop",),
)
def union_ledger(spark, sf_dir):
    """The three-expense-tables → one ledger union (SURVEY.md §2.8)."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("actor_id"), F.lit("order").alias("src")
    )
    e = T(spark, sf_dir, "events").select(
        F.col("user_id").alias("actor_id"), F.lit("event").alias("src")
    )
    return o.unionByName(e)


@query(
    "intersect_active_actors",
    oracle="""
        SELECT o_custkey AS actor_id FROM orders
        INTERSECT
        SELECT user_id AS actor_id FROM events
    """,
    tags=("setop",),
)
def intersect_active_actors(spark, sf_dir):
    """INTERSECT of two activity predicates; dedup-then-semi plan."""
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("actor_id"))
    e = T(spark, sf_dir, "events").select(F.col("user_id").alias("actor_id"))
    return o.intersect(e)


@query(
    "except_inactive_customers",
    oracle="""
        SELECT c_custkey AS actor_id FROM customer
        EXCEPT
        SELECT o_custkey AS actor_id FROM orders
    """,
    tags=("setop",),
)
def except_inactive_customers(spark, sf_dir):
    """EXCEPT: customers minus recent actors -- hash anti semantics on the whole row."""
    c = T(spark, sf_dir, "customer").select(F.col("c_custkey").alias("actor_id"))
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("actor_id"))
    return c.subtract(o)  # EXCEPT (distinct semantics), matching the SQL oracle
