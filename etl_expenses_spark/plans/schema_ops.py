"""Schema-system, SQL-surface, and remaining aggregate coverage
(SURVEY.md §1.3, §2.5 A5/A6, §2.9 F18, §3 EP3).

These close the inventory gaps that aren't plain relational operators:
the three schema modes (declared / inferred / positional-dialect), the raw
``spark.sql`` text surface the NL→SQL agent executes against, GROUPING SETS
(the general form of rollup/cube), arg-extremes aggregation, base64 codecs,
and the catalog read-back (S10).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.plans._util import T, dec, dsum
from etl_expenses_spark.plans.registry import query
from etl_expenses_spark.quality import infer_and_cast, normalize_columns
from etl_expenses_spark.scaleout import fan_out
from etl_expenses_spark.sources.readers import TESTDATA_TABLES, register_views


@query(
    "grouping_sets_spend",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets"),
)
def grouping_sets_spend(spark, sf_dir):
    """GROUPING SETS — the general form behind rollup/cube (the AI agent's
    SQL surface, `/root/reference/ai_agent/lambda_function.py:59-67`, may
    emit any of them). One shuffle regardless of set count: Spark expands
    the sets map-side and aggregates once on the grouping-id-extended key,
    so this costs the same as a single groupBy at 100 TB."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(dsum("l_extendedprice").alias("revenue"), F.count("*").alias("n"))
    )


@query(
    "schema_inference_cascade",
    oracle="""
        SELECT l_orderkey AS ok_i, CAST(l_linenumber AS BIGINT) AS ln_i,
               l_quantity AS qty_d,
               CAST(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ship_ts,
               l_returnflag AS flag_s
        FROM lineitem
    """,
    tags=("schema", "inference"),
)
def schema_inference_cascade(spark, sf_dir):
    """Schema mode 2 (inferred): stringify typed columns, then recover the
    types with the reference's inference cascade — numeric → long/double →
    timestamp → string (`/root/reference/redshift_to_bq/lambda_function.py:104-129`).
    The cascade decides from ONE bounded-sample aggregate of try_casts (no
    per-value driver loop), then applies plain codegen'd casts, so the
    decision cost is constant and the apply cost scans once at any scale."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("ok_i"),
        F.col("l_linenumber").cast("string").alias("ln_i"),
        F.col("l_quantity").cast("string").alias("qty_d"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_ts"),
        F.col("l_returnflag").alias("flag_s"),
    )
    out = infer_and_cast(li)
    # cascade must land on: long, long, double, timestamp, string
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
        "double",
        "timestamp",
        "string",
    ], out.schema.simpleString()
    return out


# The MP settlement table arrives under two header dialects; canonical names
# on the left-hand side of the projection, per
# `/root/reference/load_data/lambda_function.py:76-159` (Spanish `:137-151`).
_CANONICAL = ["order_key", "cust_key", "status", "total_price", "order_date"]
_DIALECTS = [
    {  # English headers
        "ORDER_KEY": "order_key",
        "CUST_KEY": "cust_key",
        "STATUS": "status",
        "TOTAL_PRICE": "total_price",
        "ORDER_DATE": "order_date",
    },
    {  # Spanish headers
        "clave_orden": "order_key",
        "clave_cliente": "cust_key",
        "estado": "status",
        "precio_total": "total_price",
        "fecha_orden": "order_date",
    },
]


@query(
    "dual_header_normalize",
    oracle="""
        SELECT o_orderstatus AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("schema", "dialect"),
)
def dual_header_normalize(spark, sf_dir):
    """Schema mode 3 (positional/dialect): the same table under Spanish
    headers is detected from set(df.columns) and normalized by a
    select-alias projection — replacing the reference's try/except KeyError
    fallback. The projection is free (collapses into ReadSchema); downstream
    plans see one canonical schema regardless of source dialect."""
    spanish = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("clave_orden"),
        F.col("o_custkey").alias("clave_cliente"),
        F.col("o_orderstatus").alias("estado"),
        F.col("o_totalprice").alias("precio_total"),
        F.col("o_orderdate").alias("fecha_orden"),
    )
    canon = normalize_columns(spanish, _DIALECTS)
    assert canon.columns == _CANONICAL, canon.columns
    return canon.groupBy(F.col("status")).agg(
        F.count("*").alias("n"), dsum("total_price").alias("spend")
    )


@query(
    "base64_roundtrip",
    oracle="""
        SELECT doc_id,
               base64(encode(substring(text, 1, 24))) AS b64,
               REPLACE(REPLACE(base64(encode(substring(text, 1, 24))), '+', '-'),
                       '/', '_') AS b64_urlsafe,
               decode(from_base64(base64(encode(substring(text, 1, 24))))) AS back,
               sha256(substring(text, 1, 24)) AS sha
        FROM documents
    """,
    tags=("functions", "codec"),
)
def base64_roundtrip(spark, sf_dir):
    """F17/F18: base64 encode/decode (the reference decodes urlsafe-b64 mail
    bodies, `/root/reference/extract_data_pdf/lambda_function.py:129`) plus
    sha-256 content hashing (`transform_data_pdf/lambda_function.py:9-10`).
    Pure row-local codegen'd expressions — fuse into the scan stage."""
    head = F.substring("text", 1, 24)
    b64 = F.base64(F.encode(head, "UTF-8"))
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        b64.alias("b64"),
        F.translate(b64, "+/", "-_").alias("b64_urlsafe"),
        F.decode(F.unbase64(b64), "UTF-8").alias("back"),
        F.sha2(head, 256).alias("sha"),
    )


@query(
    "agg_arg_extremes",
    oracle="""
        SELECT o_custkey,
               arg_max(o_totalprice, o_orderkey) AS latest_price,
               arg_min(o_orderpriority, o_orderkey) AS first_priority,
               MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("agg", "arg-extremes"),
)
def agg_arg_extremes(spark, sf_dir):
    """A5/O1: value-at-extreme aggregation — the reference's "first id of
    the report" (`/root/reference/load_data/lambda_function.py:165`) and
    "latest report wins" assumption (`extract_data_mp/lambda_function.py:102-104`)
    done safely: max_by/min_by on a UNIQUE ordering key (o_orderkey), so the
    answer is total-order deterministic. Single hash aggregate — no window,
    no sort, no second shuffle."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_totalprice", "o_orderkey").alias("latest_price"),
            F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


# EP3: one SQL text, executed verbatim by BOTH engines — the engine-side
# contract of the NL→SQL agent (`/root/reference/ai_agent/lambda_function.py:101-125`
# runs generated SQL; ours is `spark.sql(text)` over the registered catalog).
# Dialect-portable by construction: decimal-domain sums, ordinal GROUP BY,
# date_trunc cast to TIMESTAMP (DuckDB returns DATE), LIMIT on a unique key.
_AGENT_SQL = """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY month
    LIMIT 20
"""


@query("sql_surface_agent_query", oracle=_AGENT_SQL, tags=("sql", "agent"))
def sql_surface_agent_query(spark, sf_dir):
    """EP3: the interactive NL→SQL path — catalog views + raw SQL text →
    Spark parser → Analyzer → Catalyst → AQE. The monthly-spend example from
    the agent's welcome screen (`/root/reference/ai_agent/lambda_function.py:214-221`),
    LIMIT 20 per its prompt rule 5 (`:65`). Same text runs on DuckDB as the
    oracle — proving the SQL and DataFrame surfaces are one engine."""
    register_views(spark, sf_dir)
    return spark.sql(_AGENT_SQL)


@query(
    "catalog_inventory",
    # Computed oracle (r12 — replaces the golden literal): DuckDB reads
    # the SAME parquet files through the same pre-registered views, so its
    # information_schema IS an independent derivation of the catalog; the
    # CASE maps DuckDB's type vocabulary onto Spark's. A green row proves
    # both engines inferred identical schemas from the parquet footers —
    # a real cross-engine contract, not a pinned listing. The IN filter
    # keeps the oracle insensitive to any extra relations the harness
    # session might hold.
    oracle="""
        SELECT table_name, column_name,
               CASE data_type
                   WHEN 'BIGINT' THEN 'bigint'
                   WHEN 'INTEGER' THEN 'int'
                   WHEN 'SMALLINT' THEN 'smallint'
                   WHEN 'TINYINT' THEN 'tinyint'
                   WHEN 'DOUBLE' THEN 'double'
                   WHEN 'REAL' THEN 'float'
                   WHEN 'FLOAT' THEN 'float'
                   WHEN 'VARCHAR' THEN 'string'
                   WHEN 'BOOLEAN' THEN 'boolean'
                   WHEN 'DATE' THEN 'date'
                   WHEN 'TIMESTAMP' THEN 'timestamp'
                   WHEN 'BLOB' THEN 'binary'
                   WHEN 'FLOAT[]' THEN 'array<float>'
                   WHEN 'REAL[]' THEN 'array<float>'
                   WHEN 'DOUBLE[]' THEN 'array<double>'
                   WHEN 'BIGINT[]' THEN 'array<bigint>'
                   WHEN 'INTEGER[]' THEN 'array<int>'
                   WHEN 'VARCHAR[]' THEN 'array<string>'
                   ELSE lower(data_type)
               END AS data_type
        FROM information_schema.columns
        WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
                             'part', 'orders', 'lineitem', 'events',
                             'documents', 'embeddings')
    """,
    tags=("catalog",),
)
def catalog_inventory(spark, sf_dir):
    """S10: catalog read-back — the schema feed the agent builds its prompt
    from (`/root/reference/ai_agent/lambda_function.py:22-36` walks Glue
    get_tables). Ours lists (table, column, type) from spark.catalog after
    view registration; schemas come from parquet footers, not crawling.
    Oracle: DuckDB's information_schema over the same views (see oracle
    comment) — the two engines must agree on every inferred column type."""
    register_views(spark, sf_dir)
    rows = [
        (t, c.name, c.dataType)
        for t in TESTDATA_TABLES
        for c in spark.catalog.listColumns(t)
    ]
    return spark.createDataFrame(rows, "table_name string, column_name string, data_type string")


@query(
    "json_struct_roundtrip",
    oracle="""
        SELECT o_orderkey,
               o_orderstatus AS status,
               o_totalprice AS total,
               CAST(o_orderdate AS TIMESTAMP) AS odate,
               o_orderpriority AS prio
        FROM orders
    """,
    tags=("functions", "json", "struct"),
)
def json_struct_roundtrip(spark, sf_dir):
    """F19 deep form: serialize each order to a nested JSON document
    (to_json of struct{..., amounts:{...}}), parse it back with a declared
    schema (from_json), and surface the typed fields — the mail-doc
    JSON-tree semantics (`/root/reference/extract_data_bank_pay/lambda_function.py:182-195`)
    under full type fidelity (long/double/timestamp survive the round
    trip). `odate` is declared TimestampType (zoned) to match what
    load_table produces (parquet NTZ inference disabled), so to_json's
    offset-bearing string parses back losslessly. Row-local; fuses into
    the scan stage."""
    from pyspark.sql import types as T_

    schema = T_.StructType(
        [
            T_.StructField("o_orderkey", T_.LongType()),
            T_.StructField("status", T_.StringType()),
            T_.StructField(
                "amounts",
                T_.StructType(
                    [
                        T_.StructField("total", T_.DoubleType()),
                        T_.StructField("odate", T_.TimestampType()),
                    ]
                ),
            ),
            T_.StructField("prio", T_.StringType()),
        ]
    )
    o = T(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey"),
            F.col("o_orderstatus").alias("status"),
            F.struct(
                F.col("o_totalprice").alias("total"), F.col("o_orderdate").alias("odate")
            ).alias("amounts"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    parsed = o.select(F.from_json(doc, schema).alias("d"))
    return parsed.select(
        F.col("d.o_orderkey").alias("o_orderkey"),
        F.col("d.status").alias("status"),
        F.col("d.amounts.total").alias("total"),
        F.col("d.amounts.odate").alias("odate"),
        F.col("d.prio").alias("prio"),
    )


@query(
    "webhook_source_ingest",
    oracle="""
        SELECT i AS webhook_id,
               (i * 7919) % 999983 AS transaction_id,
               'settlement_' || i || '.csv' AS file_name,
               'https://example.invalid/reports/' || i AS url
        FROM range(0, 1000) t(i)
        WHERE i % 3 <> 0
    """,
    tags=("source", "datasource", "json"),
)
def webhook_source_ingest(spark, sf_dir):
    """S6/S9 in-engine: the webhook/REST fetch stage as a custom Python
    DataSource (sources/webhook_source.py), read in parallel partitions,
    then the dispatcher's parse: from_json the POST body, explode the files
    array, keep CSV attachments (`webhook_mp_report/lambda_function.py:14-50`
    re-expressed declaratively). The oracle regenerates the deterministic
    payload stream in SQL — the whole path source→parse→filter is checked,
    not just the parse."""
    from etl_expenses_spark.sources.webhook_source import register

    register(spark)
    raw = spark.read.format("webhook_events").option("rows", 1000).option("parts", 8).load()
    body = F.from_json(
        F.col("body"),
        "transaction_id bigint, files array<struct<name:string,type:string,url:string>>",
    )
    return (
        raw.select("webhook_id", body.alias("b"))
        .select("webhook_id", F.col("b.transaction_id").alias("transaction_id"),
                F.explode(F.col("b.files")).alias("f"))
        .filter(F.col("f.name").endswith(".csv"))
        .select(
            "webhook_id",
            "transaction_id",
            F.col("f.name").alias("file_name"),
            F.col("f.url").alias("url"),
        )
    )


@query(
    "struct_field_surgery",
    oracle="""
        SELECT o_orderkey,
               to_json({'status': o_orderstatus,
                        'priority': o_orderpriority,
                        'audit': {'loaded_by': 'engine', 'version': 2}}) AS doc_json,
               o_orderstatus AS doc_status,
               2 AS doc_version
        FROM orders
    """,
    tags=("schema", "struct"),
)
def struct_field_surgery(spark, sf_dir):
    """Nested-struct surgery: build a document struct, ADD a nested audit
    field with withField, REMOVE a field with dropFields — the schema-
    evolution operations a semi-structured gold table needs (the reference
    rewrites whole JSON docs instead,
    `/root/reference/extract_data_bank_pay/lambda_function.py:182-195`).
    Row-level, codegen'd; at scale this is how you evolve billions of
    nested docs without a Python round-trip."""
    o = T(spark, sf_dir, "orders")
    base = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),  # will be dropped
        F.col("o_orderpriority").alias("priority"),
    )
    doc = (
        base.withField(
            "audit",
            F.struct(F.lit("engine").alias("loaded_by"), F.lit(2).alias("version")),
        )
        .dropFields("price")
    )
    return o.select(
        "o_orderkey",
        F.to_json(doc).alias("doc_json"),  # structs stringify differently
        # across engines, so compare the canonical JSON serialization
        doc.getField("status").alias("doc_status"),
        doc.getField("audit").getField("version").alias("doc_version"),
    )


@query(
    "union_evolved_schemas",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, source_version
        FROM (
            SELECT o_orderkey, o_orderstatus,
                   CAST(NULL AS DOUBLE) AS o_totalprice,
                   'v1' AS source_version
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL BY NAME
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   'v2' AS source_version
            FROM orders WHERE o_orderkey % 2 = 1
        )
    """,
    tags=("setop", "schema-evolution"),
)
def union_evolved_schemas(spark, sf_dir):
    """Schema-evolution union: v1 rows (written before o_totalprice
    existed) union with v2 rows by NAME, the missing column null-filled —
    `unionByName(allowMissingColumns=True)`, the append path every
    long-lived gold table eventually needs (positional UNION would
    silently misalign columns instead)."""
    o = T(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", F.lit("v1").alias("source_version")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit("v2").alias("source_version")
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "source_version"
    )


@query(
    "sql_hinted_broadcast_join",
    oracle="""
        SELECT n.n_name AS nation, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
    tags=("sql", "hint", "join"),
)
def sql_hinted_broadcast_join(spark, sf_dir):
    """Join-strategy hints through SQL text (/*+ BROADCAST(n) */) — the
    optimizer override surface generated SQL can use when statistics
    mislead. Results are hint-invariant by definition; the strategy itself
    is asserted in tests/test_bucketed_join.py."""
    for t in ("customer", "nation"):
        T(spark, sf_dir, t).createOrReplaceTempView(f"hint_{t}")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n.n_name AS nation, COUNT(*) AS n_customers
        FROM hint_customer c JOIN hint_nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    )


@query(
    "table_profile_orders",
    oracle="""
        SELECT 'o_orderkey' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(o_orderkey) AS n_nonnull,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
               COUNT(DISTINCT o_orderstatus),
               CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
               COUNT(DISTINCT o_orderpriority),
               CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
               COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))),
               CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        FROM orders
    """,
    tags=("catalog", "profile", "agg"),
)
def table_profile_orders(spark, sf_dir):
    """Column profiling — the catalog/quality report every warehouse tool
    (and the reference's manual eyeballing of loaded CSVs) needs: row
    count, non-null count, distinct count, min/max per column, rendered as
    one (column_name, metrics...) row each.

    Plan shape is the point: ONE scan computes every column's metrics
    simultaneously (a single aggregate over 4×N aggregate expressions),
    then a tiny literal unpivot — NOT one scan per column like the naive
    UNION oracle. At 100 TB that's a 4× I/O difference; distinct counts
    dominate the shuffle and would drop to approx_count_distinct when
    exactness isn't contractual. Values stringify through DECIMAL so both
    engines render identical text for doubles."""
    o = T(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    prof = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.count_distinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("string").alias("min_key"),
        F.max("o_orderkey").cast("string").alias("max_key"),
        F.count("o_orderstatus").alias("nn_status"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.count_distinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderpriority").alias("max_prio"),
        F.count("o_totalprice").alias("nn_price"),
        F.count_distinct(price).alias("nd_price"),
        F.min(price).cast("string").alias("min_price"),
        F.max(price).cast("string").alias("max_price"),
    )
    row = F.struct
    cols = F.array(
        row(
            F.lit("o_orderkey").alias("column_name"),
            F.col("n_rows"),
            F.col("nn_key").alias("n_nonnull"),
            F.col("nd_key").alias("n_distinct"),
            F.col("min_key").alias("min_value"),
            F.col("max_key").alias("max_value"),
        ),
        row(
            F.lit("o_orderstatus").alias("column_name"),
            F.col("n_rows"),
            F.col("nn_status").alias("n_nonnull"),
            F.col("nd_status").alias("n_distinct"),
            F.col("min_status").alias("min_value"),
            F.col("max_status").alias("max_value"),
        ),
        row(
            F.lit("o_orderpriority").alias("column_name"),
            F.col("n_rows"),
            F.col("nn_prio").alias("n_nonnull"),
            F.col("nd_prio").alias("n_distinct"),
            F.col("min_prio").alias("min_value"),
            F.col("max_prio").alias("max_value"),
        ),
        row(
            F.lit("o_totalprice").alias("column_name"),
            F.col("n_rows"),
            F.col("nn_price").alias("n_nonnull"),
            F.col("nd_price").alias("n_distinct"),
            F.col("min_price").alias("min_value"),
            F.col("max_price").alias("max_value"),
        ),
    )
    return prof.select(F.explode(cols).alias("m")).select("m.*")


@query(
    "agg_partial_remerge_monthly",
    oracle="""
        WITH daily AS (
            SELECT CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP) AS day,
                   o_orderstatus,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS part_spend,
                   COUNT(*) AS part_n,
                   MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS part_max
            FROM orders
            GROUP BY 1, 2)
        SELECT CAST(DATE_TRUNC('month', day) AS TIMESTAMP) AS month,
               o_orderstatus,
               CAST(SUM(part_spend) AS DOUBLE) AS spend,
               CAST(SUM(part_n) AS BIGINT) AS n_orders,
               CAST(MAX(part_max) AS DOUBLE) AS max_order
        FROM daily
        GROUP BY 1, 2
    """,
    tags=("agg", "incremental", "rollup"),
)
def agg_partial_remerge_monthly(spark, sf_dir):
    """Partial-aggregate re-merge — the incremental-view-maintenance
    contract: DAILY partials (what an hourly/daily batch job materializes)
    merge into MONTHLY rollups without touching raw facts again. Works
    because every metric is a commutative monoid: decimal SUM re-sums,
    COUNT sums, MAX re-maxes. The oracle computes the same two-level
    cascade; both engines agree bit-exactly because the partials stay
    DECIMAL until the final cast.

    At 100 TB this is the difference between reading yesterday's 400 GB of
    partials and re-scanning the 100 TB fact table every refresh."""
    o = T(spark, sf_dir, "orders")
    price = dec("o_totalprice", 2, 18)
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day"), "o_orderstatus"
    ).agg(
        F.sum(price).alias("part_spend"),
        F.count(F.lit(1)).alias("part_n"),
        F.max(price).alias("part_max"),
    )
    return daily.groupBy(
        F.date_trunc("month", F.col("day")).alias("month"), "o_orderstatus"
    ).agg(
        F.sum("part_spend").cast("double").alias("spend"),
        F.sum("part_n").cast("bigint").alias("n_orders"),
        F.max("part_max").cast("double").alias("max_order"),
    )


@query(
    "pdf_ticket_pipeline",
    oracle="""
        WITH t AS (SELECT unnest(range(0, 200)) AS i)
        SELECT CAST(700000 + i AS BIGINT) AS nro_ticket,
               CAST(1 + i % 28 AS VARCHAR) || '/' ||
               CAST(1 + i % 12 AS VARCHAR) || '/25' AS fecha,
               'Bebidas' AS categ,
               'Agua Mineral 2L' AS prod,
               CAST(1 + i % 3 AS BIGINT) AS cant,
               CAST(0.0 AS DOUBLE) AS peso,
               CAST(850 + i AS DOUBLE) AS p_unit,
               CAST((1 + i % 3) * (850 + i) AS DOUBLE) AS p_total,
               CAST(10 * (1 + i % 7) AS DOUBLE) AS descuento
        FROM t
        UNION ALL
        SELECT CAST(700000 + i AS BIGINT),
               CAST(1 + i % 28 AS VARCHAR) || '/' ||
               CAST(1 + i % 12 AS VARCHAR) || '/25',
               'Carniceria',
               'Carne Picada',
               CAST(0 AS BIGINT),
               (1 + i % 3) * 0.25,
               CAST(5600 AS DOUBLE),
               (1 + i % 3) * 0.25 * 5600,
               CAST(10 * (1 + i % 7) AS DOUBLE)
        FROM t
    """,
    tags=("source", "pdf", "udtf", "pipeline"),
)
def pdf_ticket_pipeline(spark, sf_dir):
    """EP1 end-to-end, ORACLE-CHECKED: synthesize 200 closed-form store
    tickets, render each as a REAL compressed PDF (pdftext.make_pdf),
    extract the text back (FlateDecode + Tj walk), and run the stateful
    ticket parser (parsers.parse_ticket_text) — binary bytes → item rows,
    entirely inside Arrow-batched mapInPandas workers. Because every
    ticket value is a closed-form function of its index (weights in exact
    quarters so money stays binary-exact), DuckDB can predict the parsed
    output row-for-row — the strongest correctness statement the binary
    ingestion path can make. Reference behavior:
    `/root/reference/transform_data_pdf/lambda_function.py:12-133`."""
    import pandas as pd

    from etl_expenses_spark.parsers import TICKET_ITEM_SCHEMA

    def gen(batches):
        from etl_expenses_spark.parsers import parse_ticket_text, pdf_bytes_to_text
        from etl_expenses_spark.pdftext import make_pdf

        cols = [f.name for f in TICKET_ITEM_SCHEMA.fields]
        for b in batches:
            rows = []
            for raw in b["id"]:
                i = int(raw)
                cant = 1 + i % 3
                unit = 850 + i
                k = 1 + i % 3
                peso_str = {1: "0,25", 2: "0,5", 3: "0,75"}[k]
                wtotal = k * 25 * 56  # (k/4)*5600, exact integer
                desc = 10 * (1 + i % 7)
                text = "\n".join(
                    [
                        "SUPERMERCADO EJEMPLO S.A.",
                        f"Fecha {1 + i % 28}/{1 + i % 12}/25 Hora 19:44",
                        f"Local 001 P.V. 0003 Nro T. {700000 + i}",
                        "Caja 05",
                        "Bebidas",
                        "Agua Mineral 2L",
                        f"{cant} x {unit},00 (x) {cant * unit},00",
                        "Carniceria",
                        "Carne Picada",
                        f"{peso_str} x 5600,00 (x) {wtotal},00",
                        f"AHORRO TOTAL $ {desc},00",
                        f"TOTAL {cant * unit + wtotal},00",
                    ]
                )
                pdf = make_pdf([text], compress=True)
                rows.extend(parse_ticket_text(pdf_bytes_to_text(pdf)))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(200)
        .repartition(8)
        .mapInPandas(gen, schema=TICKET_ITEM_SCHEMA)
    )


@query(
    "xlsx_report_pipeline",
    oracle="""
        WITH t AS (SELECT unnest(range(0, 150)) AS i)
        SELECT 'r-' || CAST(1000 + i AS VARCHAR) AS report_id,
               'MERPAGO*STORE' || CAST(i % 12 AS VARCHAR) AS comercio,
               CAST(CAST(100 + i AS DOUBLE) + (i % 4) * 0.25 AS DOUBLE) AS monto,
               CAST(1 + i % 6 AS BIGINT) AS cuotas,
               (i % 3 = 0) AS aprobado
        FROM t
    """,
    tags=("source", "excel", "pipeline"),
)
def xlsx_report_pipeline(spark, sf_dir):
    """S2 end-to-end, ORACLE-CHECKED: each worker renders closed-form MP
    settlement rows into a REAL XLSX workbook (sources/xlsx.make_xlsx —
    zip, sharedStrings, typed cells), then reads it back with the stdlib
    reader (read_xlsx) and emits the rows — workbook bytes → typed rows
    entirely inside mapInPandas, with DuckDB predicting the output from
    the same closed forms (money offsets in exact binary quarters).
    Reference behavior: `pd.read_excel(BytesIO)` at
    `/root/reference/transform_data_mp/lambda_function.py:62`."""
    import pandas as pd

    def gen(batches):
        from etl_expenses_spark.sources.xlsx import make_xlsx, read_xlsx

        header = ["report_id", "comercio", "monto", "cuotas", "aprobado"]
        for b in batches:
            out = []
            for raw in b["id"]:
                i = int(raw)
                row = [
                    f"r-{1000 + i}",
                    f"MERPAGO*STORE{i % 12}",
                    float(100 + i) + (i % 4) * 0.25,
                    1 + i % 6,
                    i % 3 == 0,
                ]
                wb = make_xlsx([header, row])
                parsed = read_xlsx(wb)
                assert parsed[0] == header
                got = parsed[1]
                out.append(
                    {
                        "report_id": got[0],
                        "comercio": got[1],
                        "monto": float(got[2]),
                        "cuotas": int(got[3]),
                        "aprobado": bool(got[4]),
                    }
                )
            yield pd.DataFrame(out, columns=header)

    schema = (
        "report_id string, comercio string, monto double, cuotas bigint, aprobado boolean"
    )
    return spark.range(150).repartition(8).mapInPandas(gen, schema=schema)


@query(
    "snapshot_diff_cdc",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders),
        new AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 5 = 0
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) + 1
                        ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
            FROM orders WHERE o_orderkey % 97 <> 0
            UNION ALL
            SELECT o_orderkey + 100000000, 'O',
                   CAST(o_totalprice AS DECIMAL(18,2))
            FROM orders WHERE o_orderkey % 101 = 0)
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'I'
                    WHEN n.o_orderkey IS NULL THEN 'D'
                    ELSE 'U' END AS op,
               CAST(o.price AS DOUBLE) AS old_price,
               CAST(n.price AS DOUBLE) AS new_price
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.price <> n.price OR o.o_orderstatus <> n.o_orderstatus
    """,
    tags=("merge", "cdc", "diff"),
)
def snapshot_diff_cdc(spark, sf_dir):
    """Snapshot DIFF → change-data-capture rows: full-outer-join two table
    versions on the business key and classify each row I(nsert) /
    U(pdate) / D(elete), dropping unchanged rows — how a warehouse derives
    a CDC feed when the source can't emit one (the reference re-loads full
    CSVs and diffs by key existence only, `/root/reference/load_data/
    lambda_function.py:39-73`; this adds the update/delete classes).
    The 'new' snapshot is synthesized deterministically from orders
    (drops keys %97, bumps prices %5 by exactly 1, inserts shifted keys
    %101). One co-partitioned shuffle on the key; at 100 TB both sides
    bucket by key so the diff is zero-exchange. Prices compare in DECIMAL
    (exact), surfaced as double."""
    o = T(spark, sf_dir, "orders")
    price = dec("o_totalprice", 2, 18)
    old = o.select("o_orderkey", "o_orderstatus", price.alias("price"))
    new = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 5 == 0, price + 1).otherwise(price).alias("price"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                F.lit("O").alias("o_orderstatus"),
                price.alias("price"),
            )
        )
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    changed = (
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.price") != F.col("n.price"))
        | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
    )
    return j.filter(changed).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), "I")
        .when(F.col("n.o_orderkey").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        F.col("o.price").cast("double").alias("old_price"),
        F.col("n.price").cast("double").alias("new_price"),
    )


@query(
    "sql_pipe_syntax_agg",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    tags=("sql", "pipe-syntax", "agg"),
)
def sql_pipe_syntax_agg(spark, sf_dir):
    """Spark 4 SQL PIPE syntax (`FROM … |> WHERE … |> AGGREGATE`) on the
    agent-facing SQL surface — the modern linear dialect an NL→SQL
    generator increasingly emits. Catalyst plans it identically to the
    nested ANSI form (the DuckDB oracle is that form), so supporting it
    costs nothing at any scale; this query pins that equivalence."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
           GROUP BY o_orderpriority
        """
    )


_GROUP_BY_ALL_SQL = """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY ALL
"""


@query(
    "sql_group_by_all",
    oracle=_GROUP_BY_ALL_SQL,
    tags=("sql", "agg", "sugar"),
)
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL — the exact same SQL text runs on Spark and DuckDB
    (both infer the grouping key as every non-aggregate select item), so
    the agent can emit the modern shorthand unchanged. Plans as a plain
    hash aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)


@query(
    "agg_listagg_ordered",
    oracle="""
        SELECT l_orderkey,
               string_agg(CAST(l_linenumber AS VARCHAR), ','
                          ORDER BY l_linenumber, l_returnflag) AS lines,
               string_agg(l_returnflag, ''
                          ORDER BY l_linenumber, l_returnflag) AS flags
        FROM lineitem
        WHERE l_orderkey % 50 = 0
        GROUP BY l_orderkey
    """,
    tags=("sql", "agg", "listagg"),
)
def agg_listagg_ordered(spark, sf_dir):
    """LISTAGG (SQL:2016, Spark 4) — ordered string aggregation, the
    canonical 'concatenate the group' export op. WITHIN GROUP (ORDER BY)
    makes the output deterministic (an unordered listagg varies with
    partitioning — useless for diffing/exporting); DuckDB spells the same
    op string_agg(... ORDER BY). Plans as a sort-based aggregate: one
    shuffle on the group key, no driver-side collect."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               listagg(CAST(l_linenumber AS STRING), ',')
                   WITHIN GROUP (ORDER BY l_linenumber, l_returnflag) AS lines,
               listagg(l_returnflag, '')
                   WITHIN GROUP (ORDER BY l_linenumber, l_returnflag) AS flags
        FROM lineitem
        WHERE l_orderkey % 50 = 0
        GROUP BY l_orderkey
        """
    )


_LATERAL_SQL = """
        SELECT n.n_name, t.c_custkey, t.acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey,
                   CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
            LIMIT 3
        ) t
"""


@query(
    "sql_lateral_topk_per_group",
    oracle=_LATERAL_SQL,
    tags=("sql", "lateral", "topk"),
)
def sql_lateral_topk_per_group(spark, sf_dir):
    """LATERAL correlated subquery — top-3 customers by balance per
    nation, written as the per-row subquery an agent naturally emits. The
    IDENTICAL SQL text runs on Spark and DuckDB. Catalyst decorrelates
    the lateral into a window/rank plan (no per-row re-execution), so the
    sugar costs nothing at scale; total order inside the subquery
    (balance, custkey) keeps row picks engine-stable."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "dq_constraint_checks",
    oracle="""
        SELECT 'orders_pk_unique' AS check_name,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_fk', COUNT(*)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_orderkey_fk', COUNT(*)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem_qty_range', COUNT(*)
        FROM lineitem
        WHERE l_quantity < 1 OR l_quantity > 50
        UNION ALL
        SELECT 'orders_status_domain', COUNT(*)
        FROM orders
        WHERE o_orderstatus NOT IN ('F', 'O', 'P')
        UNION ALL
        SELECT 'customer_acctbal_not_null', COUNT(*)
        FROM customer
        WHERE c_acctbal IS NULL
    """,
    tags=("quality", "constraints"),
)
def dq_constraint_checks(spark, sf_dir):
    """Declarative constraint validation — the dbt-tests/Great-Expectations
    layer as one engine query: primary-key uniqueness, referential
    integrity (FK orphans via broadcast anti semantics), accepted-value
    domains, range checks, not-null. Output is the (check, violation
    count) table a CI gate asserts all-zeros on.

    Scale shape: each check is a scan-local aggregate or a broadcast/
    shuffle anti join keyed on the FK — no check is worse than the join it
    validates. At 100 TB you run the suite per-partition-increment (the
    WAP audit hook, operators/wap.py:publish_append_observed) instead of
    full-table; the query here is that audit expressed standalone."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    li = T(spark, sf_dir, "lineitem")

    def one(name, df):
        return df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    pk = o.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "n_violations"
        )
    ).select(F.lit("orders_pk_unique").alias("check_name"), "n_violations")
    fk_orders = one(
        "orders_custkey_fk",
        o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
    )
    fk_lineitem = one(
        "lineitem_orderkey_fk",
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
    )
    qty = one(
        "lineitem_qty_range",
        li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
    )
    domain = one(
        "orders_status_domain",
        o.filter(~F.col("o_orderstatus").isin("F", "O", "P")),
    )
    notnull = one(
        "customer_acctbal_not_null", c.filter(F.col("c_acctbal").isNull())
    )
    return (
        pk.unionByName(fk_orders)
        .unionByName(fk_lineitem)
        .unionByName(qty)
        .unionByName(domain)
        .unionByName(notnull)
    )


@query(
    "table_checksum_orders",
    oracle="""
        WITH h AS (
            SELECT CAST(concat('0x',
                       substr(md5(concat_ws('|',
                           CAST(o_orderkey AS VARCHAR),
                           CAST(o_custkey AS VARCHAR),
                           o_orderstatus,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                           strftime(o_orderdate, '%Y-%m-%d'),
                           o_orderpriority)), 1, 15))
                   AS BIGINT) AS rh
            FROM orders
        )
        SELECT COUNT(*) AS n_rows,
               bit_xor(rh) AS xor_hash,
               CAST(SUM(CAST(rh AS HUGEINT)) AS VARCHAR) AS sum_hash
        FROM h
    """,
    tags=("quality", "checksum", "agg"),
)
def table_checksum_orders(spark, sf_dir):
    """Order-insensitive table fingerprint: md5 each row's canonical string
    form, fold with XOR and an exact wide-integer SUM. Two warehouses (or a
    pre/post-copy pair, K4) hold the same relation iff (n_rows, xor_hash,
    sum_hash) agree — no sort, no row shipping, one partial-aggregated scan.

    Canonicalization pins every engine-variant surface: integers and
    decimals via CAST-to-string (identical text both engines), dates via
    explicit pattern, '|' field separator. XOR catches any single-row
    difference; the exact decimal-domain SUM (Spark DECIMAL(38,0), DuckDB
    HUGEINT, compared as text) catches the paired flips XOR cancels.

    This is the engine-side replica of the driver's own value-hash gate —
    the same idea the reference applies by re-SELECTing after load
    (`/root/reference/load_data/lambda_function.py` post-insert check),
    made shuffle-free."""
    o = T(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        dec("o_totalprice").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    rh = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return o.select(rh.alias("rh")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(rh)").alias("xor_hash"),
        F.sum(F.col("rh").cast("decimal(38,0)")).cast("string").alias("sum_hash"),
    )


@query(
    "orc_roundtrip_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        FROM orders
    """,
    tags=("source", "orc", "format"),
)
def orc_roundtrip_orders(spark, sf_dir):
    """ORC format surface: every orders row is serialized to a real ORC
    stripe (pyarrow.orc writer) and parsed back INSIDE the task, Arrow
    batch in → ORC bytes → Arrow batch out, covering the int64 / string /
    double / timestamp type mappings. The oracle reads the same rows from
    parquet, so any value the ORC codec mangles (timestamp epoch shifts,
    double rounding) fails the hash. Distributed end-to-end: each
    mapInPandas batch round-trips independently — no driver-side bytes,
    per-task memory bounded by the Arrow batch size. The directory-level
    spark.read/write.orc path (predicate pushdown, column pruning) is
    pinned in tests/test_formats.py."""
    import io

    import pyarrow as pa
    import pyarrow.orc as po

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate"]

    def rt(batches):
        for b in batches:
            t = pa.Table.from_pandas(b, preserve_index=False)
            buf = io.BytesIO()
            po.write_table(t, buf)
            back = po.read_table(io.BytesIO(buf.getvalue()))
            if back.num_rows != t.num_rows:
                raise ValueError(
                    f"ORC roundtrip dropped rows: {t.num_rows} -> {back.num_rows}"
                )
            yield back.to_pandas()

    return (
        T(spark, sf_dir, "orders")
        .select(*cols)
        .mapInPandas(
            rt,
            schema=(
                "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp"
            ),
        )
    )


@query(
    "avro_roundtrip_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        FROM orders
    """,
    tags=("source", "avro", "format"),
)
def avro_roundtrip_orders(spark, sf_dir):
    """Avro format surface: every orders row is serialized to a real Avro
    object-container file (operators/avrocodec.py — the public Avro 1.11
    binary encoding, written from the spec) and decoded back INSIDE the
    task, covering long / string / double / nullable-union / deflate-codec
    mappings; timestamps travel as timestamp-micros longs per the logical
    -type convention. The oracle reads the same rows from parquet, so any
    value the codec mangles (zigzag sign errors, varint boundaries, IEEE
    byte order, utf-8 slicing) fails the value hash. Distributed
    end-to-end: each mapInPandas batch becomes its own container file —
    no driver-side bytes, per-task memory bounded by the batch.

    r12 (VERDICT r11 #5): the hot loop is the COLUMNAR codec tier —
    numpy-vectorized zigzag/varint packing + scatter row assembly on the
    write side (byte-identical to the per-record reference writer, pinned
    by tests/test_avro.py), and a compiled flat-record plan returning
    columns on the read side (no per-datum recursion, no per-record
    dicts). The per-record path remains the property-test twin."""
    import pandas as pd

    from etl_expenses_spark.operators.avrocodec import (
        read_avro_columns,
        write_avro_columnar,
    )

    schema = {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_custkey", "type": "long"},
            {"name": "o_orderstatus", "type": ["null", "string"]},
            {"name": "o_totalprice", "type": "double"},
            {"name": "o_orderdate_us", "type": "long"},
        ],
    }

    def rt(batches):
        for b in batches:
            n = len(b)
            cols = {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "o_custkey": b["o_custkey"].to_numpy(),
                "o_orderstatus": list(b["o_orderstatus"]),
                "o_totalprice": b["o_totalprice"].to_numpy(),
                "o_orderdate_us": b["o_orderdate"]
                .astype("datetime64[us]")
                .astype("int64")
                .to_numpy(),
            }
            data = write_avro_columnar(cols, schema, codec="deflate")
            _, back = read_avro_columns(data)
            if len(back["o_orderkey"]) != n:
                raise ValueError(
                    "avro roundtrip dropped rows: "
                    f"{n} -> {len(back['o_orderkey'])}"
                )
            yield pd.DataFrame(
                {
                    "o_orderkey": back["o_orderkey"],
                    "o_custkey": back["o_custkey"],
                    "o_orderstatus": back["o_orderstatus"],
                    "o_totalprice": back["o_totalprice"],
                    "o_orderdate": pd.to_datetime(
                        back["o_orderdate_us"], unit="us"
                    ),
                }
            )

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate"]
    # r13: encode+decode is pure CPU per row and the orders file scans as
    # one task (measured 1.9 s single-threaded); fan out so each task
    # round-trips its own container file in parallel — the operator is
    # per-batch by construction, so the split changes nothing semantically.
    return (
        fan_out(T(spark, sf_dir, "orders").select(*cols), "o_orderkey")
        .mapInPandas(
            rt,
            schema=(
                "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp"
            ),
        )
    )


@query(
    "avro_source_roundtrip",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        FROM orders WHERE o_orderkey % 10 = 0
    """,
    tags=("source", "avro", "format", "connector"),
)
def avro_source_roundtrip(spark, sf_dir):
    """Avro CONNECTOR surface (vs avro_roundtrip_orders' in-task codec
    path): a filtered orders slice is written to a directory of Avro
    container files through df.write.format('etl_avro') — the Spark-4
    Python DataSource in sources/avro_source.py, one file per task
    partition — and read back with spark.read.format('etl_avro'), which
    infers the Spark schema from the first file's header (O(header)
    bytes). The oracle recomputes the slice from parquet, so the value
    hash crosses the full write->infer->read path including the
    timestamp-micros logical-type mapping. The target is a deterministic
    per-SF warehouse dir (overwrite replaces prior part files), so the
    returned DataFrame stays LAZY — no driver-side materialization."""
    import os

    from etl_expenses_spark.sources.avro_source import register

    try:
        register(spark)
    except Exception:
        pass  # already registered on this session
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    src = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(*cols)
    )
    d = os.path.join(
        "spark-warehouse", f"avro_source_rt_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    src.write.format("etl_avro").mode("overwrite").save(d)
    return spark.read.format("etl_avro").load(d)


@query(
    "format_consistency_audit",
    oracle="""
        WITH h AS (
            SELECT CAST(concat('0x',
                       substr(md5(concat_ws('|',
                           CAST(o_orderkey AS VARCHAR),
                           CAST(o_custkey AS VARCHAR),
                           o_orderstatus,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                           strftime(o_orderdate, '%Y-%m-%d'))), 1, 15))
                   AS BIGINT) AS rh
            FROM orders),
        agg AS (
            SELECT COUNT(*) AS n_rows, bit_xor(rh) AS xor_hash FROM h)
        SELECT fmt.format, agg.n_rows, agg.xor_hash
        FROM agg, (SELECT 'parquet' AS format UNION ALL
                   SELECT 'avro' UNION ALL SELECT 'orc') fmt
    """,
    tags=("quality", "checksum", "format", "multimodal"),
)
def format_consistency_audit(spark, sf_dir):
    """Cross-format value-integrity audit: the SAME orders slice flows
    through three physical representations — the parquet scan, the
    pure-Python Avro container roundtrip, and the pyarrow ORC roundtrip —
    and each path reduces to (row count, order-insensitive XOR of
    canonical row hashes). The three rows MUST agree; any codec that
    shifts a timestamp epoch, re-rounds a price, or drops a row produces
    a different xor_hash, and the oracle (which derives all three rows
    from parquet alone) catches it. This is the periodic lake-health
    check you run after introducing a new format into the pipeline.
    Shuffle-free: each path is scan -> project -> 1-row hash aggregate."""
    from etl_expenses_spark.plans.registry import REGISTRY

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate"]

    def checksum(df, fmt: str):
        canon = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            dec("o_totalprice").cast("string"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
        rh = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
        return df.select(rh.alias("rh")).agg(
            F.lit(fmt).alias("format"),
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(rh)").alias("xor_hash"),
        )

    parquet = T(spark, sf_dir, "orders").select(*cols)
    avro = REGISTRY["avro_roundtrip_orders"].build(spark, sf_dir)
    orc = REGISTRY["orc_roundtrip_orders"].build(spark, sf_dir)
    return (
        checksum(parquet, "parquet")
        .unionByName(checksum(avro, "avro"))
        .unionByName(checksum(orc, "orc"))
    )


@query(
    "sql_scripting_threshold_search",
    oracle="""
        WITH t(p) AS (VALUES (1), (10), (100), (1000), (10000), (100000),
                             (1000000)),
        eligible AS (
            SELECT p FROM t
            WHERE (SELECT COUNT(*) FROM orders WHERE o_totalprice >= p) < 100)
        SELECT CAST(MIN(p) AS BIGINT) AS threshold,
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_totalprice >= (SELECT MIN(p) FROM eligible))
                    AS BIGINT) AS n_above
        FROM eligible
    """,
    tags=("sql", "scripting", "control_flow"),
)
def sql_scripting_threshold_search(spark, sf_dir):
    """SQL scripting (Spark 4.0 `BEGIN … END` with DECLARE / WHILE / SET —
    the procedural surface warehouse users migrate stored-procedure logic
    onto): an iterative threshold search, "smallest power-of-ten price
    cutoff that keeps fewer than 100 orders", runs as ONE multi-statement
    script — each WHILE probe is a full Catalyst-planned query, the loop
    state lives in a session variable, and the final SELECT is the
    script's result relation. The oracle derives the same fixpoint
    declaratively (the candidate ladder + correlated counts), proving the
    procedural and declarative answers coincide. 100 TB shape: each probe
    is one filter-aggregate scan (min/max-pruned by the o_totalprice
    predicate); the script adds zero driver-side row movement."""
    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE thr BIGINT DEFAULT 1;
          WHILE (SELECT COUNT(*) FROM orders WHERE o_totalprice >= thr) >= 100
          DO
            SET thr = thr * 10;
          END WHILE;
          SELECT thr AS threshold,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                  WHERE o_totalprice >= thr) AS n_above;
        END
        """
    )


@query(
    "approx_top_k_event_types",
    oracle="""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type
        ORDER BY n DESC, event_type
    """,
    tags=("sketch", "topk", "agg"),
)
def approx_top_k_event_types(spark, sf_dir):
    """`approx_top_k` (Spark 4.1 SQL) — the sketch-backed frequent-items
    aggregate: one pass builds a bounded items-tracked summary instead of
    a full GROUP BY, the right shape when the key universe dwarfs memory
    but only the head matters. Here k and maxItemsTracked both clear the
    column's true cardinality, so the sketch is provably exact and the
    plain COUNT oracle pins it; the struct-array result is exploded to
    rows and re-sorted deterministically (count desc, item asc) because
    the sketch's own tie order is not a contract. Compare
    heavy_hitters_two_pass (exact two-pass MG) and countmin_user_frequency
    (mergeable grid) — this is the built-in third tier."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT entry.item AS event_type, entry.count AS n
        FROM (
          SELECT explode(approx_top_k(event_type, 10, 10000)) AS entry
          FROM events
        )
        ORDER BY n DESC, event_type
        """
    )


@query(
    "csv_corrupt_quarantine",
    oracle="""
        WITH routed AS (
            SELECT CASE WHEN o_orderkey % 13 = 5
                        THEN 'quarantined' ELSE 'ok' END AS status,
                   CASE WHEN o_orderkey % 13 = 5
                        THEN CAST(0 AS DECIMAL(18,2))
                        ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS amt
            FROM orders)
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(amt) AS DOUBLE) AS total_ok
        FROM routed GROUP BY status
    """,
    tags=("csv", "quality", "quarantine", "badrecords"),
)
def csv_corrupt_quarantine(spark, sf_dir):
    """PERMISSIVE CSV ingest with corrupt-record QUARANTINE — the ingest
    hardening the reference's flows do by hand (unparseable amounts are
    caught, logged, and nulled per row at
    /root/reference/transform_data_bank_pay/lambda_function.py:16-20): a
    deterministically-mangled CSV copy of orders
    (rows with o_orderkey % 13 = 5 get a non-numeric price) is read back
    with an explicit schema + ``columnNameOfCorruptRecord``, malformed
    lines land in the corrupt column instead of killing the job or being
    silently nulled, and the query routes them to a quarantine count while
    the clean rows aggregate exactly.

    Scale shape: schema-first PERMISSIVE parse is scan-fused (no second
    pass); the corrupt column is populated per-row by the parser, so
    routing is a projection, and the quarantine side costs nothing until
    someone reads it. The cache() is the documented Spark requirement for
    referencing the internal corrupt column.

    Oracle: the mangling rule is keyed on o_orderkey, so DuckDB derives
    the same routing declaratively from the clean table."""
    import os

    from etl_expenses_spark.caching import tracked_persist
    from etl_expenses_spark.plans._util import work_dir

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", dec("o_totalprice").alias("amt")
    )
    # deterministic mangled CSV: bad rows get a non-numeric price token
    lines = o.select(
        F.concat_ws(
            ";",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.when(
                F.col("o_orderkey") % 13 == 5, F.lit("N0T_A_PRICE")
            ).otherwise(F.col("amt").cast("string")),
        ).alias("value")
    )
    feed = os.path.join(work_dir("csv_corrupt_quarantine", sf_dir), "feed")
    lines.write.mode("overwrite").text(feed)

    raw = (
        spark.read.schema(
            "o_orderkey long, o_custkey long, amt decimal(18,2), "
            "_corrupt string"
        )
        .option("sep", ";")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(feed)
    )
    raw = tracked_persist(raw)  # Spark requires caching to read _corrupt
    routed = raw.select(
        F.when(F.col("_corrupt").isNotNull(), F.lit("quarantined"))
        .otherwise(F.lit("ok"))
        .alias("status"),
        F.coalesce(F.col("amt"), F.lit(0).cast("decimal(18,2)")).alias("amt"),
    )
    return routed.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("amt").cast("double").alias("total_ok"),
    )
