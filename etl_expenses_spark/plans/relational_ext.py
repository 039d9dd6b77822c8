"""Extended relational surface — multi-join analytics, array/map functions,
exact dispersion statistics, distribution windows, null-safe joins, VARIANT
JSON access, and a Spark-4 Python UDTF.

These extend SURVEY.md §2.4/§2.5/§2.9 beyond the reference's literal surface
to the full capability set its AI-agent entry point (J5/A6 — arbitrary
generated SQL over the catalog, `/root/reference/ai_agent/lambda_function.py:51-69`)
can demand: the agent is free to emit multi-way joins, statistics, and JSON
access, so the engine must execute them well at scale.

Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.window import Window as W

from etl_expenses_spark.plans._util import T, dec, dsum
from etl_expenses_spark.plans.registry import query


# --------------------------------------------------------------------------
# TPC-H Q3 shape: the canonical fact-fact-dim 3-way join with pushed filters.
# At 100 TB: customer filter prunes before the join (predicate pushdown into
# the scan), orders⨝customer shuffles on custkey, lineitem⨝orders on
# orderkey; AQE picks broadcast for the post-filter customer side when it
# fits. TakeOrderedAndProject bounds the result — no global sort.
# --------------------------------------------------------------------------
@query(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey AS orderkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1999-01-01'
          AND l.l_shipdate > TIMESTAMP '1999-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3: unshipped-orders revenue priority (J5 latent join surface)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1999-01-01")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1999-01-01")
    revenue = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            l.l_orderkey.alias("orderkey"),
            o.o_orderdate,
            o.o_orderpriority,
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way snowflake join. region/nation/supplier are dims →
# explicit broadcast (no fact shuffle for them); the only big shuffle is
# lineitem⨝orders on orderkey. The c_nationkey = s_nationkey predicate rides
# along as a post-join filter on broadcast columns.
# --------------------------------------------------------------------------
@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_items
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue via local suppliers, per nation of an ASIA region."""
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = T(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


# --------------------------------------------------------------------------
# Array-function surface over document tokens (extends F1/F6 to the
# ArrayType algebra a curation pipeline lives on). Pure row-level — fuses
# into the scan stage, no shuffle.
# --------------------------------------------------------------------------
@query(
    "array_functions",
    oracle="""
        SELECT p_partkey,
               CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_tokens,
               string_split(p_name, ' ')[1] AS first_token,
               array_to_string(
                   list_slice(list_sort(list_distinct(string_split(p_name, ' '))), 1, 3),
                   ',') AS head3_sorted,
               CAST(COALESCE(list_position(string_split(p_name, ' '), 'steel'), 0)
                    AS BIGINT) AS steel_pos,
               list_contains(string_split(p_name, ' '), 'steel') AS has_steel
        FROM part
    """,
    tags=("functions", "array"),
)
def array_functions(spark, sf_dir):
    """size/element_at/slice/sort_array/array_distinct/position/contains."""
    p = T(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ",").alias(
            "head3_sorted"
        ),
        F.array_position(toks, "steel").cast("long").alias("steel_pos"),
        F.array_contains(toks, "steel").alias("has_steel"),
    )


# --------------------------------------------------------------------------
# Exact dispersion statistics. Built-in stddev/var are single-pass float
# folds whose result depends on partitioning — not reproducible across
# engines or cluster sizes. Instead: decimal-domain SUM(x), SUM(x²) (exact,
# associative → safe under any parallelism), then the identical IEEE double
# expression in both engines. At 100 TB this is a plain map-side-combined
# aggregate — 3 numbers per group per task cross the shuffle.
# --------------------------------------------------------------------------
@query(
    "agg_dispersion_stats",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q2
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               sum_q / n AS mean_qty,
               SQRT((sum_q2 - sum_q * sum_q / n) / (n - 1)) AS stddev_qty,
               SQRT((sum_q2 - sum_q * sum_q / n) / n) AS stddev_pop_qty
        FROM s
        ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_dispersion_stats(spark, sf_dir):
    """Reproducible mean/stddev via exact decimal moments (A6 extension)."""
    li = T(spark, sf_dir, "lineitem")
    q = dec("l_quantity", 2, 18)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sum_q"),
        F.sum(q * q).cast("double").alias("sum_q2"),
    )
    n = F.col("n")
    sum_q, sum_q2 = F.col("sum_q"), F.col("sum_q2")
    return s.select(
        "l_returnflag",
        "n",
        (sum_q / n).alias("mean_qty"),
        F.sqrt((sum_q2 - sum_q * sum_q / n) / (n - F.lit(1))).alias("stddev_qty"),
        F.sqrt((sum_q2 - sum_q * sum_q / n) / n).alias("stddev_pop_qty"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist / ntile /
# first+nth value. Deterministic because the ORDER BY carries a unique
# tiebreaker (p_partkey) — both engines then compute identical rank/n
# double divisions. One shuffle on p_brand; each partition sorts locally.
# --------------------------------------------------------------------------
@query(
    "window_distribution_ranks",
    oracle="""
        SELECT p_partkey, p_brand, p_retailprice,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               first_value(p_partkey) OVER w AS cheapest_key,
               nth_value(p_partkey, 2) OVER
                   (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_cheapest_key
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
    tags=("window",),
)
def window_distribution_ranks(spark, sf_dir):
    """percent_rank/cume_dist/ntile/first_value/nth_value per brand."""
    p = T(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("p_partkey").over(w).alias("cheapest_key"),
        F.nth_value("p_partkey", 2).over(w_full).alias("second_cheapest_key"),
    )


# --------------------------------------------------------------------------
# Null-safe equi join (<=> / IS NOT DISTINCT FROM). The reference's loaders
# treat NULL keys as loadable rows (format_value emits SQL NULL,
# `/root/reference/load_data/lambda_function.py:6-13`); a dedup-merge keyed
# on a nullable column needs null-safe equality or NULL rows silently never
# match. Spark hashes NULL like any value under <=>, so this stays a
# hash/broadcast join — no plan penalty.
# --------------------------------------------------------------------------
@query(
    "null_safe_join",
    oracle="""
        WITH l AS (SELECT o_orderkey,
                          NULLIF(o_orderpriority, '1-URGENT') AS pri_key
                   FROM orders),
             r AS (SELECT pri_key, COUNT(*) AS n_in_group FROM l GROUP BY pri_key)
        SELECT l.pri_key, r.n_in_group, COUNT(*) AS n_joined
        FROM l JOIN r ON l.pri_key IS NOT DISTINCT FROM r.pri_key
        GROUP BY l.pri_key, r.n_in_group
        ORDER BY l.pri_key NULLS FIRST
    """,
    tags=("join", "nulls"),
)
def null_safe_join(spark, sf_dir):
    """eqNullSafe join: NULL keys match NULL (J1-J4 nullable-key semantics)."""
    o = T(spark, sf_dir, "orders")
    left = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri_key"),
    )
    right = (
        left.groupBy("pri_key")
        .agg(F.count(F.lit(1)).alias("n_in_group"))
        .withColumnRenamed("pri_key", "r_pri_key")
    )
    return (
        left.join(
            F.broadcast(right), F.col("pri_key").eqNullSafe(F.col("r_pri_key")), "inner"
        )
        .groupBy("pri_key", "n_in_group")
        .agg(F.count(F.lit(1)).alias("n_joined"))
        .orderBy(F.asc_nulls_first("pri_key"))
    )


# --------------------------------------------------------------------------
# VARIANT JSON access (Spark 4): parse once into the binary VARIANT
# encoding, then typed path extraction — the shredded/columnar successor to
# get_json_object (F19). At scale, parse_json runs once per row in the scan
# stage; repeated field accesses don't re-parse the string.
# --------------------------------------------------------------------------
@query(
    "variant_props_rollup",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k')
                                       AS BIGINT) > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("functions", "json", "variant"),
)
def variant_props_rollup(spark, sf_dir):
    """Typed VARIANT path access + integer rollup over event props."""
    ev = T(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_high"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Python UDTF (Spark 4 `@udtf`): the lateral table-function form of the
# reference's 1-row→N-rows parsers (§2.11 — PDF bytes → item rows). The
# mapInPandas parsers in parsers.py are the Arrow bulk path; this is the
# declarative SQL-surface twin (`..., LATERAL f(col)`), so generated SQL can
# invoke row-exploding parse logic too. Bounded to doc_id < 200 — the
# pattern under test is the lateral join, not corpus throughput.
# --------------------------------------------------------------------------
@udtf(returnType="pos int, word string")
class SplitWordsUDTF:
    def eval(self, text: str):  # noqa: D102
        if text:
            for i, w in enumerate(text.split(" ")):
                yield i, w


@query(
    "udtf_lateral_word_split",
    oracle="""
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                    AS INTEGER) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
        WHERE doc_id < 200
    """,
    tags=("udtf", "lateral"),
)
def udtf_lateral_word_split(spark, sf_dir):
    """LATERAL Python UDTF: one document row → one row per token."""
    spark.udtf.register("split_words_udtf", SplitWordsUDTF)
    T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).createOrReplaceTempView(
        "udtf_docs_src"
    )
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.word "
        "FROM udtf_docs_src d, LATERAL split_words_udtf(d.text) s"
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING — filter on an aggregate, then join the surviving
# keys back to the fact tables. At 100 TB: the groupBy shuffles lineitem on
# orderkey once; the HAVING output is tiny → broadcast back against orders,
# so the second join is shuffle-free. TakeOrdered bounds the result.
# --------------------------------------------------------------------------
@query(
    "having_large_orders",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
        )
        SELECT c.c_name, o.o_orderkey, o.o_orderdate, b.total_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY b.total_qty DESC, o.o_orderkey
        LIMIT 20
    """,
    tags=("agg", "having", "join", "topk", "tpch"),
)
def having_large_orders(spark, sf_dir):
    """TPC-H Q18: customers with large-quantity orders (HAVING surface)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 2, 18)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# MapType surface: parse JSON props into map<string,bigint> once, then the
# map algebra (size / element_at / map_keys). Row-level, fuses into the
# scan; the from_json appears once in the plan however many fields are read.
# --------------------------------------------------------------------------
@query(
    "map_functions",
    oracle="""
        SELECT event_id,
               CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               array_to_string(json_keys(props), ',') AS keys_csv
        FROM events
    """,
    tags=("functions", "map", "json"),
)
def map_functions(spark, sf_dir):
    """from_json→MapType + size/element_at/map_keys (F19 map algebra)."""
    ev = T(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


# --------------------------------------------------------------------------
# Higher-order functions over arrays: transform / filter / aggregate with
# lambdas — the declarative (no-Python) path for token-level logic. These
# run interpreted (no codegen) but JVM-side: still ~10× a row-at-a-time
# Python UDF, and zero serialization. For the hot path at 100 TB, dedup
# operators hash once and move on (see operators/dedup.py).
# --------------------------------------------------------------------------
@query(
    "higher_order_array_ops",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 4))
                    AS INTEGER) AS n_long_tokens,
               CAST(list_sum(list_transform(string_split(text, ' '), t -> len(t)))
                    AS BIGINT) AS total_token_chars,
               array_to_string(
                   list_slice(list_transform(string_split(text, ' '),
                                             t -> CAST(len(t) AS VARCHAR)), 1, 5),
                   ',') AS first5_lens
        FROM documents
    """,
    tags=("functions", "array", "lambda"),
)
def higher_order_array_ops(spark, sf_dir):
    """F.transform/F.filter/F.aggregate lambda algebra over document tokens."""
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_token_chars"),
        F.array_join(
            F.slice(F.transform(toks, lambda t: F.length(t).cast("string")), 1, 5), ","
        ).alias("first5_lens"),
    )


# --------------------------------------------------------------------------
# Upsert merge (K3 extension): MERGE semantics via updates ∪ (target
# anti-join updates). The reference only ever INSERTs (and compensates by
# manual UPDATE on failure, `/root/reference/compensation_flow/lambda_function.py:34-56`);
# a gold table needs the update path too.
# --------------------------------------------------------------------------
@query(
    "merge_upsert_orders",
    oracle="""
        WITH u AS (
            SELECT o_orderkey,
                   'U' AS o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_orderkey % 10 = 0
        )
        SELECT * FROM u
        UNION ALL
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.o_orderkey = o.o_orderkey)
    """,
    tags=("merge", "upsert", "sink"),
)
def merge_upsert_orders(spark, sf_dir):
    """Upsert: a 10% price-bump batch replaces matching gold rows in place."""
    from etl_expenses_spark.operators.merge import upsert

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (dec("o_totalprice", 2, 18) * F.lit("1.1").cast("decimal(2,1)"))
        .cast("double")
        .alias("o_totalprice"),
    )
    return upsert(updates, o, ["o_orderkey"])


# --------------------------------------------------------------------------
# Set operations, ALL variants — multiset semantics (keep duplicates). The
# non-ALL twins are in core.py. Spark plans these as a union + grouped
# count-diff (no row-by-row state) — same shuffle class as a groupBy.
# --------------------------------------------------------------------------
@query(
    "except_all_order_lines",
    oracle="""
        SELECT l_orderkey FROM lineitem
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1
    """,
    tags=("setop",),
)
def except_all_order_lines(spark, sf_dir):
    """EXCEPT ALL: per-key multiplicities subtract instead of deduping —
    orders keep one row per line beyond their first."""
    li = T(spark, sf_dir, "lineitem")
    return li.select("l_orderkey").exceptAll(
        li.filter(F.col("l_linenumber") == 1).select("l_orderkey")
    )


@query(
    "intersect_all_heavy_quantities",
    oracle="""
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT ALL
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("setop",),
)
def intersect_all_heavy_quantities(spark, sf_dir):
    """INTERSECT ALL: min-of-multiplicities per value across two branches."""
    li = T(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint").alias("qty")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .select(qty)
        .intersectAll(li.filter(F.col("l_returnflag") == "A").select(qty))
    )


# --------------------------------------------------------------------------
# SQL-text surface with correlated subqueries: the NL→SQL agent (EP3,
# `/root/reference/ai_agent/lambda_function.py:51-82`) emits whatever SQL the
# model writes — EXISTS and scalar subqueries included. Catalyst rewrites
# the EXISTS to a left-semi join and the scalar subquery to an aggregated
# broadcast join; nothing here is row-at-a-time at scale.
# --------------------------------------------------------------------------
@query(
    "sql_exists_and_scalar_subquery",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2))
                    - (SELECT CAST(AVG(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,6))
                       FROM customer c2) AS DOUBLE) AS bal_vs_avg
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        ORDER BY c.c_custkey
    """,
    tags=("sql", "subquery"),
)
def sql_exists_and_scalar_subquery(spark, sf_dir):
    """spark.sql text: correlated EXISTS + uncorrelated scalar subquery.

    Decimal-domain note: AVG in the decimal domain is exact only if
    quantized identically in both engines, so the average is computed as a
    DECIMAL(_,6) in both before the double subtraction."""
    for t in ("customer", "orders"):
        T(spark, sf_dir, t).createOrReplaceTempView(f"sq_{t}")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2))
                    - (SELECT CAST(AVG(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,6))
                       FROM sq_customer c2) AS DOUBLE) AS bal_vs_avg
        FROM sq_customer c
        WHERE EXISTS (SELECT 1 FROM sq_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        ORDER BY c.c_custkey
        """
    )


# --------------------------------------------------------------------------
# SCD Type-2 merge: dimension history with validity intervals. The
# reference keeps no history (rows are INSERTed once and compensated by
# manual UPDATE on failure); a warehouse gold layer needs the
# close-and-version pattern. Plan shape: one semi + one anti join against
# the (tiny) changed-key set — both broadcast — plus a 3-way union; the
# dimension scans once.
# --------------------------------------------------------------------------
@query(
    "scd2_customer_segments",
    oracle="""
        WITH cur AS (
            SELECT c_custkey, c_mktsegment,
                   DATE '2024-01-01' AS valid_from,
                   CAST(NULL AS DATE) AS valid_to
            FROM customer
        ),
        chg AS (
            SELECT c_custkey, c_mktsegment || '_V2' AS c_mktsegment
            FROM customer WHERE c_custkey % 7 = 0
        )
        SELECT c.c_custkey, c.c_mktsegment, c.valid_from, c.valid_to
        FROM cur c WHERE c.c_custkey % 7 <> 0          -- unchanged
        UNION ALL
        SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
               DATE '2024-06-01' AS valid_to            -- closed-out version
        FROM cur c WHERE c.c_custkey % 7 = 0
        UNION ALL
        SELECT g.c_custkey, g.c_mktsegment,
               DATE '2024-06-01' AS valid_from,
               CAST(NULL AS DATE) AS valid_to           -- new version
        FROM chg g
    """,
    tags=("merge", "scd2", "pipeline"),
)
def scd2_customer_segments(spark, sf_dir):
    """SCD2: a segment-change batch closes the old dimension row
    (valid_to = snapshot date) and appends the new version (open interval).
    Written with the general joins — semi for close-out, anti for
    pass-through — so the same plan applies when the change set is computed,
    not derived: at 100 TB the change set is small → both joins broadcast,
    the dimension shuffles zero times."""
    c = T(spark, sf_dir, "customer")
    cur = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    chg = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("c_mktsegment")
    )
    chg_keys = chg.select("c_custkey")
    unchanged = cur.join(F.broadcast(chg_keys), "c_custkey", "left_anti")
    closed = cur.join(F.broadcast(chg_keys), "c_custkey", "left_semi").withColumn(
        "valid_to", F.lit("2024-06-01").cast("date")
    )
    fresh = chg.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2024-06-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return unchanged.unionByName(closed).unionByName(fresh)


# --------------------------------------------------------------------------
# SQL UDF surface (Spark 4 CREATE FUNCTION): the money-parse expression
# registered as a catalog function and invoked from SQL text — what the
# NL→SQL agent would call. RETURN-expression UDFs inline into the plan
# (codegen, pushdown-transparent) — this is NOT a Python UDF.
# --------------------------------------------------------------------------
@query(
    "sql_udf_money_parse",
    oracle="""
        WITH raw AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'U$S ' ELSE '$' END
                   || replace(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                              '.', ',') AS monto_raw
            FROM orders
        )
        SELECT o_orderkey,
               CAST(CAST(replace(replace(CASE WHEN monto_raw LIKE 'U$S %'
                         THEN substring(monto_raw, 5) ELSE substring(monto_raw, 2) END,
                         '.', ''), ',', '.') AS DECIMAL(12,2)) AS DOUBLE) AS monto,
               CASE WHEN contains(monto_raw, 'U$S') THEN 'USD' ELSE 'ARS' END AS divisa
        FROM raw
    """,
    tags=("functions", "money", "sql-udf"),
)
def sql_udf_money_parse(spark, sf_dir):
    """F9 through the SQL surface: generated SQL calls parse_money_sql /
    currency_of_sql as ordinary catalog functions."""
    from etl_expenses_spark.functions.sql_udfs import register_sql_udfs

    register_sql_udfs(spark)
    T(spark, sf_dir, "orders").createOrReplaceTempView("sqludf_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(parse_money_sql(monto_raw) AS DOUBLE) AS monto,
               currency_of_sql(monto_raw) AS divisa
        FROM (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'U$S ' ELSE '$' END
                   || translate(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING),
                                '.', ',') AS monto_raw
            FROM sqludf_orders)
        """
    )


# --------------------------------------------------------------------------
# Native XML (Spark 4 from_xml): the semi-structured family completed —
# JSON (from_json/VARIANT), XML, and HTML (parser UDTF). Round-trip shape:
# rows → XML text → parsed struct; the oracle simply re-selects the source
# values, so any fidelity loss in either direction fails the gate.
# --------------------------------------------------------------------------
@query(
    "xml_roundtrip",
    oracle="""
        SELECT o_orderkey, o_orderstatus AS status,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        FROM orders
    """,
    tags=("functions", "xml"),
)
def xml_roundtrip(spark, sf_dir):
    """format_string → XML document → from_xml struct → typed columns."""
    o = T(spark, sf_dir, "orders")
    xml = F.format_string(
        "<order><status>%s</status><total>%s</total></order>",
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    parsed = F.from_xml(xml, "status STRING, total DECIMAL(18,2)")
    return o.select(
        "o_orderkey",
        parsed.getField("status").alias("status"),
        parsed.getField("total").cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer. lineitem filters on
# returnflag at the scan (pushed), joins orders on orderkey (the one big
# shuffle), then the customer/nation dims broadcast onto the aggregated
# (small) result — dims join AFTER the aggregate, so the fact join carries
# only keys, not customer payload columns.
# --------------------------------------------------------------------------
@query(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10: which customers returned the most revenue this year."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    per_cust = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(revenue).alias("rev_dec"))
    )
    # customer is NOT broadcast-hinted: it's customer-cardinality (not a
    # small dim) — locally AQE broadcasts it under the threshold, at SF1000
    # the same plan degrades gracefully to a shuffle join on custkey.
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape: conditional aggregation (SUM of CASE) + IN-list
# predicate. One scan, one tiny shuffle (group keys = priorities); the
# CASE arms fold into the partial aggregate — no second pass per arm.
# --------------------------------------------------------------------------
@query(
    "tpch_q12_priority_shipmode",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
               COUNT(*) AS n_lines
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("agg", "conditional", "tpch"),
)
def tpch_q12_priority_shipmode(spark, sf_dir):
    """TPC-H Q12: priority-class line counts via SUM(CASE) conditional
    aggregation over a year of shipments."""
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# NOT IN with a nullable subquery: standard three-valued logic means ONE
# NULL in the subquery empties the result — the classic silent-wrong-answer
# SQL trap. Both engines implement the standard (Spark plans it as
# null-aware anti join); the pair of queries pins the contract: with NULLs
# stripped the anti-set comes back.
# --------------------------------------------------------------------------
@query(
    "not_in_null_semantics",
    oracle="""
        SELECT
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN
                 (SELECT NULLIF(o_custkey, o_custkey) FROM orders LIMIT 1))
                AS n_with_null_in_list,
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
                AS n_without_nulls
    """,
    tags=("sql", "subquery", "nulls"),
)
def not_in_null_semantics(spark, sf_dir):
    """NOT IN vs NULL: a NULL in the value list makes every row UNKNOWN
    (count 0); the NULL-free list behaves as the anti join."""
    for t in ("customer", "orders"):
        T(spark, sf_dir, t).createOrReplaceTempView(f"ni_{t}")
    return spark.sql(
        """
        SELECT
            (SELECT COUNT(*) FROM ni_customer
             WHERE c_custkey NOT IN
                 (SELECT NULLIF(o_custkey, o_custkey) FROM ni_orders LIMIT 1))
                AS n_with_null_in_list,
            (SELECT COUNT(*) FROM ni_customer
             WHERE c_custkey NOT IN (SELECT o_custkey FROM ni_orders))
                AS n_without_nulls
        """
    )


# --------------------------------------------------------------------------
# Gap filling + forward fill: regularize an irregular per-user event series
# onto a daily spine, carrying the last observation forward. The spine is
# generated with sequence() (no driver loop); the fill is one
# last(ignorenulls) window — a single shuffle on user_id.
# --------------------------------------------------------------------------
@query(
    "gapfill_daily_user_values",
    oracle="""
        WITH bounds AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('day', MIN(ts)) AS DATE) AS d0,
                   CAST(DATE_TRUNC('day', MAX(ts)) AS DATE) AS d1
            FROM events WHERE user_id < 20 GROUP BY user_id
        ),
        spine AS (
            SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM bounds
        ),
        daily AS (
            SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
            FROM events WHERE user_id < 20 GROUP BY 1, 2
        )
        SELECT s.user_id, s.day,
               COALESCE(d.day_value,
                        LAST_VALUE(d.day_value IGNORE NULLS) OVER (
                            PARTITION BY s.user_id ORDER BY s.day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS filled_value,
               (d.day_value IS NULL) AS was_gap
        FROM spine s LEFT JOIN daily d
          ON d.user_id = s.user_id AND d.day = s.day
    """,
    tags=("temporal", "gapfill", "window"),
)
def gapfill_daily_user_values(spark, sf_dir):
    """Daily spine via sequence() + explode, then last-observation-carried-
    forward with a last(ignorenulls) running window."""
    e = T(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    daily = (
        e.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(F.sum(dec("value")).cast("double").alias("day_value"))
    )
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("d1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(
            F.col("day_value"), F.last("day_value", ignorenulls=True).over(w)
        ).alias("filled_value"),
        F.col("day_value").isNull().alias("was_gap"),
    )


# --------------------------------------------------------------------------
# Histogram by equi-width bucketing: pure integer floor arithmetic (no
# width_bucket builtin dependency) so both engines compute identical bucket
# ids. One partial-aggregated shuffle of ~n_buckets rows per task.
# --------------------------------------------------------------------------
@query(
    "histogram_order_totals",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
               CAST(CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) * 25000.0
                    AS DOUBLE) AS bucket_low,
               COUNT(*) AS n_orders,
               CAST(MIN(o_totalprice) AS DOUBLE) AS min_in_bucket,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_in_bucket
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("agg", "histogram"),
)
def histogram_order_totals(spark, sf_dir):
    """Equi-width histogram of order totals (25k buckets) — the profiling
    aggregate behind every data-quality dashboard; min/max ride along as
    exact extremes (no float summation)."""
    o = T(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000.0).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("min_in_bucket"),
            F.max("o_totalprice").cast("double").alias("max_in_bucket"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 25000.0).alias("bucket_low"),
            "n_orders",
            "min_in_bucket",
            "max_in_bucket",
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: OR-of-ANDs disjunctive predicate. Catalyst extracts the
# common conjuncts (quantity bounds) and pushes what it can to the scan;
# the disjunction evaluates in one codegen'd pass — no union-of-three-scans.
# --------------------------------------------------------------------------
@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
        SELECT COUNT(*) AS n_matched,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 1 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 10 AND l.l_quantity <= 30)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("join", "predicate", "tpch"),
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: three-armed OR-of-ANDs over a broadcast part join."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    q = F.col("l_quantity")
    arm = lambda brand, lo_sz, hi_sz, lo_q, hi_q: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(lo_sz, hi_sz)
        & (q >= lo_q)
        & (q <= hi_q)
    )
    revenue = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .filter(
            arm("Brand#11", 1, 15, 1, 20)
            | arm("Brand#23", 10, 30, 10, 30)
            | arm("Brand#34", 20, 50, 20, 40)
        )
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4): ONE SQL string runs verbatim on both engines.
# Spark's recursion is UNION ALL-only (no cycle-safe UNION yet), so the
# demo is a monotone recursion — a month spine from min to max order date,
# left-joined to expose empty months. Graph closures with cycles stay on
# the DataFrame loop (operators/dedup.py:connected_components).
# --------------------------------------------------------------------------
_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
    SELECT CAST(DATE_TRUNC('month', (SELECT MIN(o_orderdate) FROM {t})) AS DATE)
    UNION ALL
    SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
    WHERE m < CAST(DATE_TRUNC('month', (SELECT MAX(o_orderdate) FROM {t})) AS DATE)
)
SELECT m AS month_start, COUNT(o.o_orderkey) AS n_orders
FROM months LEFT JOIN {t} o
  ON CAST(DATE_TRUNC('month', o.o_orderdate) AS DATE) = months.m
GROUP BY m
"""


@query(
    "sql_recursive_month_spine",
    oracle=_RECURSIVE_SPINE_SQL.format(t="orders"),
    tags=("sql", "recursive-cte", "temporal"),
)
def sql_recursive_month_spine(spark, sf_dir):
    """Recursive CTE through the SQL-text surface: the month spine + empty-
    month counts, same SQL string as the oracle (portable ANSI recursion)."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("rcte_orders")
    return spark.sql(_RECURSIVE_SPINE_SQL.format(t="rcte_orders"))


# --------------------------------------------------------------------------
# Z-order layout key: bit-interleave two bucketed dimensions so a sort by
# the key clusters files into (custkey, day) rectangles — min/max stats
# then prune on EITHER predicate column. The expression is the same
# shift/mask/OR tree in both engines.
# --------------------------------------------------------------------------
@query(
    "zorder_layout_key",
    oracle=None,  # filled below — needs the generated expression text
    tags=("layout", "zorder", "functions"),
)
def zorder_layout_key(spark, sf_dir):
    """Morton key over (custkey bucket, order-day bucket) + the layout
    preview: top-20 orders by z-key with both source dims, showing the
    space-filling-curve ordering a writer would sortWithinPartitions by."""
    from etl_expenses_spark.functions.ids import zorder_key

    o = T(spark, sf_dir, "orders")
    xb = (F.col("o_custkey") % 4096).cast("long")
    yb = (F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")) % 4096).cast(
        "long"
    )
    withkey = o.select(
        "o_orderkey",
        xb.alias("cust_bucket"),
        yb.alias("day_bucket"),
        zorder_key(xb, yb, bits=12).alias("zkey"),
    )
    return withkey.orderBy("zkey", "o_orderkey").limit(20)


# register the oracle now that the expression generator exists
from etl_expenses_spark.functions.ids import zorder_key_sql  # noqa: E402
from etl_expenses_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["zorder_layout_key"].oracle = f"""
    WITH b AS (
        SELECT o_orderkey,
               CAST(o_custkey % 4096 AS BIGINT) AS cust_bucket,
               CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 4096 AS BIGINT)
                   AS day_bucket
        FROM orders
    )
    SELECT o_orderkey, cust_bucket, day_bucket,
           {zorder_key_sql('cust_bucket', 'day_bucket', bits=12)} AS zkey
    FROM b
    ORDER BY zkey, o_orderkey
    LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q14 shape: a ratio of two conditional aggregates in one pass —
# both numerator and denominator are exact decimal sums from the SAME
# grouped aggregate, divided once in double (identical IEEE op).
# --------------------------------------------------------------------------
@query(
    "tpch_q14_promo_revenue",
    oracle="""
        WITH s AS (
            SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                            THEN CAST(l.l_extendedprice AS DECIMAL(9,2))
                                 * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                            ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE) AS promo,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                       AS total
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
              AND l.l_shipdate < TIMESTAMP '1997-10-01'
        )
        SELECT 100.0 * promo / total AS promo_revenue_pct, promo, total FROM s
    """,
    tags=("agg", "conditional", "tpch"),
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: share of September-97 revenue from promo parts."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = T(spark, sf_dir, "part")
    rev = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    zero = F.lit(0).cast("decimal(9,2)")
    s = (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero))
            .cast("double")
            .alias("promo"),
            F.sum(rev).cast("double").alias("total"),
        )
    )
    return s.select(
        (F.lit(100.0) * F.col("promo") / F.col("total")).alias("promo_revenue_pct"),
        "promo",
        "total",
    )


# --------------------------------------------------------------------------
# Map-valued HOFs: transform_values / map_filter over the parsed props map
# — the declarative path for per-key feature rescaling in a map column.
# --------------------------------------------------------------------------
@query(
    "map_transform_functions",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) * 10 AS k_scaled,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                    THEN 1 ELSE 0 END AS kept_after_filter
        FROM events
    """,
    tags=("functions", "map", "lambda"),
)
def map_transform_functions(spark, sf_dir):
    """transform_values (scale every value ×10) + map_filter (keep >50) on
    the props map; emitted as scalars so the oracle compares engine-neutral
    values rather than engine-specific map renderings."""
    ev = T(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    scaled = F.transform_values(m, lambda _, v: v * 10)
    kept = F.map_filter(m, lambda _, v: v > 50)
    return ev.select(
        "event_id",
        F.element_at(scaled, "k").alias("k_scaled"),
        F.size(kept).cast("int").alias("kept_after_filter"),
    )


# --------------------------------------------------------------------------
# Array-building aggregates: collect_list / collect_set. Collection order
# is engine- and partitioning-dependent, so both sides sort before joining
# to a string — the deterministic way to expose these aggregates.
# --------------------------------------------------------------------------
@query(
    "agg_collect_priorities",
    oracle="""
        SELECT o_orderstatus,
               array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|')
                   AS priorities_seen,
               CAST(len(list(DISTINCT o_orderpriority)) AS INTEGER)
                   AS n_distinct_priorities,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("agg", "collect"),
)
def agg_collect_priorities(spark, sf_dir):
    """collect_set per group, made deterministic by sort_array+array_join
    (raw collection order depends on partitioning — never compare it)."""
    o = T(spark, sf_dir, "orders")
    cs = F.collect_set("o_orderpriority")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(F.sort_array(cs), "|").alias("priorities_seen"),
            F.size(cs).alias("n_distinct_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS-driven count — how many orders per priority had
# at least one late line. Catalyst plans the EXISTS as a left-semi join on
# orderkey; the aggregate runs on the semi-join survivors.
# --------------------------------------------------------------------------
@query(
    "tpch_q4_order_priority_check",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("agg", "semi", "tpch"),
)
def tpch_q4_order_priority_check(spark, sf_dir):
    """TPC-H Q4: orders with at least one line shipped >60 days after
    ordering, counted per priority (correlated EXISTS → left-semi)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape: the pure filter-aggregate — no join, no group keys. The
# whole query is one codegen'd scan stage with three pushed-down range
# predicates; the "shuffle" carries exactly one row.
# --------------------------------------------------------------------------
@query(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                        * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
                   AS revenue_increase,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "filter", "tpch"),
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: revenue left on the table by mid-range discounts."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice", 2, 9) * dec("l_discount", 2, 3))
        .cast("double")
        .alias("revenue_increase"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Star-schema denormalization: the "one big table" ELT materialization.
# Single fact pass: lineitem⨝orders is the only fact-fact shuffle; all
# four dims broadcast onto it. Bounded to one ship-year here so the
# correctness gate's row compare stays cheap; the plan is identical
# unbounded.
# --------------------------------------------------------------------------
@query(
    "gold_denormalized_sales",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(l.l_quantity AS DOUBLE) AS quantity,
               CAST(CAST(l.l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2))) AS DOUBLE)
                   AS net_price,
               o.o_orderdate, o.o_orderpriority,
               c.c_name AS customer_name, c.c_mktsegment,
               n.n_name AS customer_nation, r.r_name AS customer_region,
               p.p_brand, p.p_type,
               s.s_name AS supplier_name
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE l.l_shipdate >= TIMESTAMP '2000-01-01'
          AND l.l_shipdate < TIMESTAMP '2001-01-01'
    """,
    tags=("join", "denormalize", "materialize"),
)
def gold_denormalized_sales(spark, sf_dir):
    """Wide denormalized sales table (the dashboard-feeding materialization;
    the reference's BigQuery-export analog at
    `/root/reference/redshift_to_bq/lambda_function.py:172-182`)."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2001-01-01")
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    p = T(spark, sf_dir, "part")
    s = T(spark, sf_dir, "supplier")
    net = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            net.cast("double").alias("net_price"),
            "o_orderdate",
            "o_orderpriority",
            F.col("c_name").alias("customer_name"),
            "c_mktsegment",
            F.col("n_name").alias("customer_nation"),
            F.col("r_name").alias("customer_region"),
            "p_brand",
            "p_type",
            F.col("s_name").alias("supplier_name"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade volume — supplier nation ↔ customer
# nation pairs, yearly. Both nation dims broadcast twice under different
# aliases; lineitem⨝orders is again the only big shuffle.
# --------------------------------------------------------------------------
@query(
    "tpch_q7_nation_trade_volume",
    oracle="""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l.l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def tpch_q7_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7: NATION_1↔NATION_2 shipping volume per direction per year
    (testdata nations are synthetic NATION_k names)."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    cn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape: market share — a ratio of conditional to total aggregate
# per year, over the full snowflake. The BRAZIL share divides two exact
# decimal sums from the same grouped pass (one shuffle, one division).
# --------------------------------------------------------------------------
@query(
    "tpch_q8_market_share",
    oracle="""
        WITH flat AS (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(l.l_extendedprice AS DECIMAL(9,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(3,2))) AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = cn.n_regionkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE r.r_name = 'AMERICA'
              AND p.p_type LIKE 'ECONOMY%'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_lines
        FROM flat
        GROUP BY o_year
        ORDER BY o_year
    """,
    tags=("join", "agg", "ratio", "tpch"),
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_3's share of AMERICA's economy-part order volume."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = T(spark, sf_dir, "customer")
    cn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = T(spark, sf_dir, "supplier")
    sn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_type").like("ECONOMY%"))
    volume = dec("l_extendedprice", 2, 9) * (F.lit(1) - dec("l_discount", 2, 3))
    zero = F.lit(0).cast("decimal(9,2)")
    flat = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("cn_region"))
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Gap-filling, interpolation tier: where LOCF (gapfill_daily_user_values)
# carries the last value flat, this draws the line between the bracketing
# observations. Same spine + one extra first(ignorenulls) forward window;
# edge gaps (no bracket on one side) fall back to the known side.
# --------------------------------------------------------------------------
@query(
    "gapfill_interpolate_linear",
    oracle="""
        WITH bounds AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('day', MIN(ts)) AS DATE) AS d0,
                   CAST(DATE_TRUNC('day', MAX(ts)) AS DATE) AS d1
            FROM events WHERE user_id < 20 GROUP BY user_id
        ),
        spine AS (
            SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM bounds
        ),
        daily AS (
            SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
            FROM events WHERE user_id < 20 GROUP BY 1, 2
        ),
        j AS (
            SELECT s.user_id, s.day, d.day_value,
                   LAST_VALUE(CASE WHEN d.day_value IS NULL THEN NULL
                                   ELSE struct_pack(d := d.day, v := d.day_value)
                              END IGNORE NULLS)
                       OVER (PARTITION BY s.user_id ORDER BY s.day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                   FIRST_VALUE(CASE WHEN d.day_value IS NULL THEN NULL
                                    ELSE struct_pack(d := d.day, v := d.day_value)
                               END IGNORE NULLS)
                       OVER (PARTITION BY s.user_id ORDER BY s.day
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
            FROM spine s LEFT JOIN daily d
              ON d.user_id = s.user_id AND d.day = s.day
        )
        SELECT user_id, day,
               CASE WHEN day_value IS NOT NULL THEN day_value
                    WHEN pv IS NULL THEN nv.v
                    WHEN nv IS NULL THEN pv.v
                    ELSE pv.v + (nv.v - pv.v)
                         * (CAST(DATEDIFF('day', pv.d, day) AS DOUBLE)
                            / CAST(DATEDIFF('day', pv.d, nv.d) AS DOUBLE))
               END AS filled_value,
               (day_value IS NULL) AS was_gap
        FROM j
    """,
    tags=("temporal", "gapfill", "window"),
)
def gapfill_interpolate_linear(spark, sf_dir):
    """Linear interpolation across daily gaps: missing days get the value
    on the straight line between the previous and next observed days;
    leading/trailing gaps fall back to the nearest known value.

    Two ignorenulls windows over the same (user_id, day) shuffle — the
    backward bracket via last(), the forward via first() — each carrying a
    (day, value) struct so slope and distance come from one pass. The
    interpolation arithmetic is the same IEEE expression tree on both
    engines (double add/sub/mul/div in identical order), so results are
    bit-identical."""
    e = T(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum(dec("value")).cast("double").alias("day_value"))
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("d1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    obs = F.when(
        F.col("day_value").isNotNull(), F.struct(F.col("day").alias("d"), F.col("day_value").alias("v"))
    )
    back = (
        W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id").orderBy("day").rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    j = j.withColumn("pv", F.last(obs, ignorenulls=True).over(back)).withColumn(
        "nv", F.first(obs, ignorenulls=True).over(fwd)
    )
    frac = F.datediff(F.col("day"), F.col("pv.d")).cast("double") / F.datediff(
        F.col("nv.d"), F.col("pv.d")
    ).cast("double")
    filled = (
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .when(F.col("pv").isNull(), F.col("nv.v"))
        .when(F.col("nv").isNull(), F.col("pv.v"))
        .otherwise(F.col("pv.v") + (F.col("nv.v") - F.col("pv.v")) * frac)
    )
    return j.select(
        "user_id",
        "day",
        filled.alias("filled_value"),
        F.col("day_value").isNull().alias("was_gap"),
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join reduction (operators/bloom.py): the runtime-filter
# pattern Spark injects internally (SPARK-32268), built from relational
# primitives because bloom_filter_agg/might_contain are not in the public
# registry. Probe side (lineitem) is filtered by a broadcast 1-row bit-array
# map BEFORE the exact semi-join — at 100 TB the probe shuffle carries only
# true matches + ~fp% noise instead of the full fact table, and the filter
# broadcast is O(m bits) regardless of build-side row count.
# --------------------------------------------------------------------------
@query(
    "bloom_semijoin_reduction",
    oracle="""
        SELECT l.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)
                   AS gross_revenue
        FROM lineitem l
        WHERE l.l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 250000)
        GROUP BY l.l_returnflag
    """,
    tags=("join", "bloom", "scale"),
)
def bloom_semijoin_reduction(spark, sf_dir):
    """Revenue of lineitems belonging to high-value orders, computed as
    bloom-prefilter → exact semi-join → aggregate. The bloom stage is pure
    reduction: the final left-semi join removes its false positives, so the
    result is bit-identical to the oracle's plain IN-subquery — the filter
    changes the PLAN (probe shuffle volume), never the ANSWER."""
    from etl_expenses_spark.operators.bloom import bloom_semijoin

    build = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_orderkey")
    )
    probe = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    kept = bloom_semijoin(probe, build, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_extendedprice", 2, 9).alias("gross_revenue"),
    )


@query(
    "arrow_grouped_weighted_median",
    oracle="""
        WITH t AS (
            SELECT l_returnflag AS flag,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem),
        r AS (
            SELECT flag, cents,
                   SUM(w) OVER (PARTITION BY flag ORDER BY cents
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(w) OVER (PARTITION BY flag) AS tot
            FROM t)
        SELECT flag, CAST(tot AS BIGINT) AS total_weight,
               CAST(MIN(cents) AS BIGINT) AS wmedian_cents
        FROM r WHERE 2 * cum >= tot
        GROUP BY flag, tot
    """,
    tags=("agg", "arrow", "udaf", "median"),
)
def arrow_grouped_weighted_median(spark, sf_dir):
    """Quantity-weighted LOWER median of line price per return flag,
    computed with ``groupBy().applyInArrow`` — the Spark-4 Arrow-native
    grouped-UDF surface (zero pandas conversion: the group arrives as a
    pyarrow.Table, numpy sorts it in place). Lower weighted median =
    smallest value whose doubled cumulative weight reaches the group
    total — an integer definition, so both engines agree bit-exactly
    (the oracle derives it with two windows; ties collapse to the same
    value on both sides).

    Scale shape: one hash shuffle on the 3-value group key; the per-group
    sort is O(g log g) inside the task. For high-cardinality group keys
    this plan holds as-is; for a SINGLE giant group the right tool is the
    distributed two-phase rank (equidepth_histogram_totals) instead —
    documented here so nobody reaches for applyInArrow at that shape."""
    import numpy as np
    import pyarrow as pa

    t = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (dec("l_extendedprice", 2, 18) * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )

    def wmedian(table: pa.Table) -> pa.Table:
        cents = np.asarray(table["cents"])
        w = np.asarray(table["w"])
        order = np.argsort(cents, kind="stable")
        cents, w = cents[order], w[order]
        cum = np.cumsum(w)
        tot = int(cum[-1])
        ix = int(np.searchsorted(2 * cum, tot))
        return pa.table(
            {
                "flag": [table["flag"][0].as_py()],
                "total_weight": [tot],
                "wmedian_cents": [int(cents[ix])],
            }
        )

    return t.groupBy("flag").applyInArrow(
        wmedian, schema="flag string, total_weight bigint, wmedian_cents bigint"
    )


@query(
    "cogroup_user_orders_events",
    oracle="""
        WITH o AS (
            SELECT o_custkey AS uid, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        ) AS BIGINT) AS spend_cents
            FROM orders GROUP BY o_custkey),
        e AS (
            SELECT user_id AS uid, COUNT(*) AS n_events,
                   CAST(MIN(event_id) AS BIGINT) AS first_event
            FROM events GROUP BY user_id)
        SELECT COALESCE(o.uid, e.uid) AS uid,
               CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(o.spend_cents, 0) AS BIGINT) AS spend_cents,
               CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(e.first_event, -1) AS BIGINT) AS first_event
        FROM o FULL OUTER JOIN e ON e.uid = o.uid
    """,
    tags=("udf", "cogroup", "pandas", "join"),
)
def cogroup_user_orders_events(spark, sf_dir):
    """`cogroup().applyInPandas` — the last uncovered Python-execution
    surface (§2.11 family: row UDF, pandas UDF, mapInPandas UDTF,
    applyInPandasWithState, applyInArrow, and now the two-relation
    cogroup): orders and events are co-partitioned on the user key and
    each key's TWO pandas frames arrive in one function call — the shape
    for per-entity reconciliation logic that genuinely needs both sides
    in memory at once (here: order spend vs event activity per user,
    with integer-cent exactness). The oracle is the declarative twin —
    a FULL OUTER join of the two aggregates — so the claim checked is
    that the cogrouped imperative path and the relational path agree
    row-for-row. At 100 TB each side shuffles once on the key; per-task
    memory is one user's rows from each side (user-grain groups — no
    hub risk on this key)."""
    import pandas as pd

    orders = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    events = T(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "event_id"
    )

    def summarize(key, odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "uid": [int(key[0])],
                "n_orders": [len(odf)],
                "spend_cents": [int(odf["cents"].sum()) if len(odf) else 0],
                "n_events": [len(edf)],
                "first_event": [
                    int(edf["event_id"].min()) if len(edf) else -1
                ],
            }
        )

    return (
        orders.groupBy("uid")
        .cogroup(events.groupBy("uid"))
        .applyInPandas(
            summarize,
            schema="uid bigint, n_orders bigint, spend_cents bigint, "
            "n_events bigint, first_event bigint",
        )
    )


def _skyline_2d_pass(pts, pid_col, min_col="cents", max_col="odate"):
    """One 2D skyline sweep within each ``pid_col`` group: keep a row iff
    no row in the same group dominates it (``min_col`` ≤ AND ``max_col`` ≥,
    one strict). Two windows over one exchange: the strictly-smaller frame
    (RANGE excludes min_col ties) and the equal-min partition — a row is
    dominated iff the smaller frame reaches its max_col (tie there still
    dominates: min_col is strictly smaller) or an equal-min row strictly
    beats it. Validates the columns up front (they are positional
    semantics, not decoration)."""
    missing = [c for c in (pid_col, min_col, max_col) if c not in pts.columns]
    if missing:
        raise ValueError(f"_skyline_2d_pass: missing columns {missing} "
                         f"in {pts.columns}")
    w_cheaper = (
        W.partitionBy(pid_col)
        .orderBy(min_col)
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_same = W.partitionBy(pid_col, min_col)
    return (
        pts.withColumn("m1", F.max(max_col).over(w_cheaper))
        .withColumn("m2", F.max(max_col).over(w_same))
        .filter(
            ~(
                F.coalesce(F.col("m1") >= F.col(max_col), F.lit(False))
                | (F.col("m2") > F.col(max_col))
            )
        )
        .drop("m1", "m2")
    )


@query(
    "skyline_orders_2d",
    oracle="""
        WITH pts AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                   o_orderdate AS odate
            FROM orders)
        SELECT p.o_orderkey, p.cents, p.odate
        FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.cents <= p.cents AND q.odate >= p.odate
              AND (q.cents < p.cents OR q.odate > p.odate))
        ORDER BY p.cents, p.o_orderkey
    """,
    tags=("relational", "skyline", "dominance"),
)
def skyline_orders_2d(spark, sf_dir):
    """SKYLINE (Pareto-dominance) operator — Börzsönyi et al. ICDE 2001's
    "skyline of cheap AND recent": every order no other order beats on
    both price (lower-or-equal) and order date (newer-or-equal) with at
    least one strict improvement. The oracle is the literal NOT EXISTS
    dominance definition; the Spark plan is the distributed two-phase
    algorithm: a LOCAL 2D sweep per partition (sort by price, running-max
    date — two windows over one exchange) discards everything locally
    dominated, then the same sweep runs once over the union of local
    skylines (dominance is transitive, so skyline(S) ⊆ ∪ local skylines —
    the classic divide-and-merge proof).

    100 TB shape: the full relation is touched once, partition-locally;
    only local winners (for anti-correlated dims, O(per-partition skyline)
    rows — typically ~log-size for independent dims) reach the final
    merge, which is the same bounded-final-pass pattern as the suffix
    array's edge rows. No all-pairs comparison ever happens."""
    pts = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderdate").alias("odate"),
    )
    k = max(2, spark.sparkContext.defaultParallelism)
    local = _skyline_2d_pass(
        pts.repartition(k).withColumn("pid", F.spark_partition_id()), "pid"
    ).drop("pid")
    return (
        _skyline_2d_pass(local.withColumn("pid", F.lit(0)), "pid")
        .drop("pid")
        .orderBy("cents", "o_orderkey")
    )


@query(
    "skyline_orders_3d",
    oracle="""
        WITH lq AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT)
                       AS qty
            FROM lineitem GROUP BY l_orderkey),
        pts AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                   o_orderdate AS odate,
                   lq.qty
            FROM orders JOIN lq ON lq.l_orderkey = o_orderkey)
        SELECT p.o_orderkey, p.cents, p.odate, p.qty
        FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts d
            WHERE d.cents <= p.cents AND d.odate >= p.odate
              AND d.qty >= p.qty
              AND (d.cents < p.cents OR d.odate > p.odate
                   OR d.qty > p.qty))
        ORDER BY p.cents, p.o_orderkey
    """,
    tags=("relational", "skyline", "dominance", "3d"),
)
def skyline_orders_3d(spark, sf_dir):
    """SKYLINE in THREE dimensions — cheap AND recent AND high-volume
    (price min, order date max, total line quantity max) — proving the
    two-phase operator family is not hardwired to the sorted-2D window
    trick (VERDICT r9 stretch #7): in 3D joint dominance cannot be reduced
    to a running scalar max, so the LOCAL phase is the classic SFS
    (sort-filter-skyline, Chomicki et al. ICDE 2003) sweep per partition —
    rows sorted by (cents asc, odate desc, qty desc) so dominance only
    flows earlier→later, each row checked against the partition's growing
    skyline with one vectorized numpy comparison (O(n·s_local), s_local =
    local skyline size) inside one applyInPandas stage. The MERGE phase
    exploits skyline(S) ⊆ ∪ local skylines (dominance is transitive): the
    bounded union self-joins under the literal dominance predicate as a
    broadcast anti-join — an all-pairs among ~partitions·s_local rows,
    never among the relation.

    Identical-point ties survive on both sides (dominance requires one
    STRICT improvement), so no arbitrary tiebreak enters the result; the
    oracle is the 3-way NOT EXISTS definition itself.

    100 TB shape: one partition-local pass over the facts, one bounded
    broadcast merge — same silhouette as the 2D tier and the suffix
    array's edge pass; skyline size for independent dims grows
    polylogarithmically, so the merge input stays driver-safe."""
    lq = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 2, 18)).cast("bigint").alias("qty"))
    )
    pts = (
        T(spark, sf_dir, "orders")
        .join(lq, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
            F.col("o_orderdate").cast("long").alias("osec"),
            "qty",
        )
    )
    return (
        _skyline_3d(pts, spark)
        .select(
            "o_orderkey",
            "cents",
            F.timestamp_seconds(F.col("osec")).alias("odate"),
            "qty",
        )
        .orderBy("cents", "o_orderkey")
    )


def _skyline_3d(pts, spark):
    """Two-phase 3D skyline over (o_orderkey, cents min, osec max, qty max)
    long columns: partition-local SFS sweep (applyInPandas) + bounded
    broadcast anti-join merge. Returns the same four columns. Factored out
    of skyline_orders_3d so the tie/duplicate property tests
    (tests/test_skyline.py) hammer it on adversarial point sets."""
    import numpy as np
    import pandas as pd

    def sfs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["cents", "osec", "qty"], ascending=[True, False, False]
        )
        c = pdf["cents"].to_numpy(np.int64)
        o = pdf["osec"].to_numpy(np.int64)
        v = pdf["qty"].to_numpy(np.int64)
        keep = np.zeros(len(pdf), dtype=bool)
        sk: list[int] = []  # indices into the sorted arrays
        for i in range(len(pdf)):
            if sk:
                sc, so, sv = c[sk], o[sk], v[sk]
                dominated = bool(
                    np.any(
                        (so >= o[i])
                        & (sv >= v[i])
                        & ((sc < c[i]) | (so > o[i]) | (sv > v[i]))
                    )
                )
            else:
                dominated = False
            if not dominated:
                keep[i] = True
                sk.append(i)
        return pdf.loc[keep, ["o_orderkey", "cents", "osec", "qty"]]

    from etl_expenses_spark.caching import tracked_persist

    k = max(2, spark.sparkContext.defaultParallelism)
    # persisted: BOTH sides of the dominance self-join read it — without
    # the persist the whole scan→join→SFS chain executes twice (once for
    # the broadcast build, once for the probe)
    local = tracked_persist(
        pts.repartition(k)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .applyInPandas(sfs, schema="o_orderkey long, cents long, osec long, qty long")
    )
    p, d = local.alias("p"), local.alias("d")
    dominance = (
        (F.col("d.cents") <= F.col("p.cents"))
        & (F.col("d.osec") >= F.col("p.osec"))
        & (F.col("d.qty") >= F.col("p.qty"))
        & (
            (F.col("d.cents") < F.col("p.cents"))
            | (F.col("d.osec") > F.col("p.osec"))
            | (F.col("d.qty") > F.col("p.qty"))
        )
    )
    return p.join(F.broadcast(d), dominance, "left_anti").select(
        F.col("p.o_orderkey").alias("o_orderkey"),
        F.col("p.cents").alias("cents"),
        F.col("p.osec").alias("osec"),
        F.col("p.qty").alias("qty"),
    )


@query(
    "skyline_insert_maintenance",
    oracle="""
        WITH pts AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                   o_orderdate AS odate
            FROM orders)
        SELECT p.o_orderkey, p.cents, p.odate
        FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.cents <= p.cents AND q.odate >= p.odate
              AND (q.cents < p.cents OR q.odate > p.odate))
        ORDER BY p.cents, p.o_orderkey
    """,
    tags=("relational", "skyline", "dominance", "incremental"),
)
def skyline_insert_maintenance(spark, sf_dir):
    """INCREMENTAL skyline maintenance under INSERTS — the IVM × skyline
    composition: the stored view is skyline(history) (orders before the
    cutoff, materialized once), and today's delta folds in by sweeping
    ONLY (stored skyline ∪ delta) — the history is never rescanned. Sound
    because dominance is transitive: skyline(A ∪ B) =
    skyline(skyline(A) ∪ B) — any point of A that dominates something in
    the union is itself undominated in A or is dominated by such a point,
    so the stored view preserves every dominator. (Deletes are the
    asymmetric case: removing a skyline point can RESURRECT points the
    view discarded, so delete-maintenance needs the base or a thicker
    k-skyband view — out of scope here, stated rather than hidden.)

    The oracle recomputes the full skyline from ALL orders — the
    maintain-equals-recompute invariant, same contract as the grouped-
    totals and join-view IVM rows. At 100 TB: the stored view is
    skyline-sized (polylog for independent dims), so the daily fold costs
    one sweep over |view| + |delta| rows — against a full-history resweep
    otherwise."""
    pts = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderdate").alias("odate"),
    )
    cutoff = "1996-01-01"
    base = pts.filter(F.col("odate") < cutoff)
    delta = pts.filter(F.col("odate") >= cutoff)
    k = max(2, spark.sparkContext.defaultParallelism)

    def two_phase(p):
        local = _skyline_2d_pass(
            p.repartition(k).withColumn("pid", F.spark_partition_id()), "pid"
        ).drop("pid")
        return _skyline_2d_pass(local.withColumn("pid", F.lit(0)), "pid").drop(
            "pid"
        )

    stored_view = two_phase(base)  # materialized once, |skyline(history)| rows
    maintained = two_phase(stored_view.unionByName(delta))
    return maintained.orderBy("cents", "o_orderkey")


@query(
    "skyline_delete_maintenance",
    # Full-recompute oracle (the IVM maintain-equals-recompute contract):
    # the maintained skyline must equal the skyline of ALL orders minus
    # the two deleted champions — the view mechanics (layered skyband)
    # never appear in the oracle.
    oracle="""
        WITH pts AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                   o_orderdate AS odate
            FROM orders),
        base AS (SELECT * FROM pts WHERE odate < TIMESTAMP '1996-01-01'),
        bsky AS (
            SELECT p.* FROM base p
            WHERE NOT EXISTS (
                SELECT 1 FROM base q
                WHERE q.cents <= p.cents AND q.odate >= p.odate
                  AND (q.cents < p.cents OR q.odate > p.odate))),
        d AS (SELECT o_orderkey FROM bsky
              ORDER BY cents, o_orderkey LIMIT 2),
        live AS (SELECT * FROM pts
                 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d))
        SELECT p.o_orderkey, p.cents, p.odate
        FROM live p
        WHERE NOT EXISTS (
            SELECT 1 FROM live q
            WHERE q.cents <= p.cents AND q.odate >= p.odate
              AND (q.cents < p.cents OR q.odate > p.odate))
        ORDER BY p.cents, p.o_orderkey
    """,
    tags=("relational", "skyline", "dominance", "incremental", "delete"),
)
def skyline_delete_maintenance(spark, sf_dir):
    """INCREMENTAL skyline maintenance under DELETES + inserts (VERDICT
    r10 #4 — the asymmetric case `skyline_insert_maintenance` states):
    removing a skyline point can RESURRECT points the thin view already
    discarded, so the stored view must be THICK. Here the view is the
    first `kband`=3 onion layers of the history — layer 1 = skyline(base),
    layer i+1 = skyline(base minus earlier layers), built by iterating the
    same two-phase sweep the thin view uses. Sufficiency: a point that
    enters the skyline after deleting a set D has every dominator chain
    inside D, so its layer depth is at most |D|+1 — the 3-layer view is
    exact for any |D| <= 2 deletions per fold (the skyband bound; deeper
    delete batches rebuild the view, stated not hidden).

    The fold deletes the two CURRENT champions (the lowest-cents skyline
    rows — deletions guaranteed to force resurrection), folds the day's
    inserts, and sweeps ONLY (view \\ D) ∪ delta — the history is never
    rescanned. Oracle: full recompute over all orders minus D (maintain ==
    recompute, the IVM contract). At 100 TB the view is skyband-sized
    (polylog for independent dims); the k-layer build is a one-time cost
    amortized over every subsequent O(|view| + |delta|) fold."""
    pts = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderdate").alias("odate"),
    )
    cutoff = "1996-01-01"
    base = pts.filter(F.col("odate") < cutoff)
    delta = pts.filter(F.col("odate") >= cutoff)
    k = max(2, spark.sparkContext.defaultParallelism)

    def two_phase(p):
        local = _skyline_2d_pass(
            p.repartition(k).withColumn("pid", F.spark_partition_id()), "pid"
        ).drop("pid")
        return _skyline_2d_pass(local.withColumn("pid", F.lit(0)), "pid").drop(
            "pid"
        )

    kband = 3
    layers = []
    remaining = base
    for _ in range(kband):
        # r13: eager localCheckpoint instead of persist — each layer is
        # skyband-sized (rows, not MBs), and truncating the lineage here
        # keeps the final fold's plan from nesting three left_anti chains
        # that AQE re-optimizes stage by stage (profiled: 1.7 s of driver
        # gap between 26 jobs with the persist; A/B min 2.70 s vs 2.98 s)
        lay = two_phase(remaining).localCheckpoint()
        layers.append(lay)
        remaining = remaining.join(
            lay.select("o_orderkey"), "o_orderkey", "left_anti"
        )
    view = layers[0]
    for lay in layers[1:]:
        view = view.unionByName(lay)

    # delete the two current champions: guaranteed skyline members, so the
    # fold must resurrect their layer-2 successors
    deleted = (
        layers[0].orderBy("cents", "o_orderkey").limit(2).select("o_orderkey")
    )
    maintained = two_phase(
        view.join(F.broadcast(deleted), "o_orderkey", "left_anti").unionByName(
            delta
        )
    )
    return maintained.orderBy("cents", "o_orderkey")
