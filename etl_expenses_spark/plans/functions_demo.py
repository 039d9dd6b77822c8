"""Scalar-function surface (SURVEY.md §2.9 F1-F20) as oracle-checked queries.

Each query exercises a family of the reference's string/date/hash/json
functions as pure Column expressions over the testdata tables, with a DuckDB
twin computing the identical values. All row-level (no shuffle) — at scale
these fuse into whatever stage scans the table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.functions.dates import fix_two_digit_year, pad_time
from etl_expenses_spark.functions.ids import payment_id
from etl_expenses_spark.functions.money import currency_of, parse_money
from etl_expenses_spark.plans._util import T
from etl_expenses_spark.plans.registry import query
from etl_expenses_spark.scaleout import fan_out


@query(
    "string_functions",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               CAST(LENGTH(p_name) AS INTEGER) AS name_len,
               SPLIT_PART(p_type, ' ', 1) AS type_head,
               CONCAT_WS('-', p_brand, p_type) AS brand_type,
               SUBSTRING(p_name, 1, 5) AS name_prefix,
               REPLACE(p_name, ' ', '_') AS name_snake,
               STRPOS(p_name, 'a') AS first_a,
               TRIM(CONCAT('  ', p_name, ' ')) AS trimmed,
               ENDS_WITH(p_type, 'STEEL') AS is_steel
        FROM part
    """,
    tags=("functions", "string"),
)
def string_functions(spark, sf_dir):
    """F1-F8: split/concat/length/replace/trim/substring/locate/case/suffix."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.element_at(F.split("p_type", " "), 1).alias("type_head"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.locate("a", F.col("p_name")).cast("long").alias("first_a"),
        F.trim(F.concat(F.lit("  "), "p_name", F.lit(" "))).alias("trimmed"),
        F.col("p_type").endswith("STEEL").alias("is_steel"),
    )


@query(
    "date_functions",
    oracle="""
        SELECT o_orderkey,
               YEAR(o_orderdate) AS yr,
               MONTH(o_orderdate) AS mo,
               DAY(o_orderdate) AS dom,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(o_orderdate AS DATE) + 30 AS plus_30d,
               CAST(o_orderdate AS DATE) - 7 AS minus_7d,
               DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_95
        FROM orders
    """,
    tags=("functions", "date"),
)
def date_functions(spark, sf_dir):
    """F10/F11/F13: to_date/date_trunc/date_add/date_sub/datediff — the
    watermark and interval arithmetic family
    (`/root/reference/extract_data_pdf/lambda_function.py:92-108`)."""
    o = T(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(d, 30).alias("plus_30d"),
        F.date_sub(d, 7).alias("minus_7d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_95"),
    )


@query(
    "two_digit_year_repair",
    oracle="""
        WITH raw AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN CAST(DAY(o_orderdate) AS VARCHAR) || '/' ||
                             CAST(MONTH(o_orderdate) AS VARCHAR) || '/' ||
                             SUBSTRING(CAST(YEAR(o_orderdate) AS VARCHAR), 3, 2)
                        ELSE CAST(DAY(o_orderdate) AS VARCHAR) || '/' ||
                             CAST(MONTH(o_orderdate) AS VARCHAR) || '/' ||
                             CAST(YEAR(o_orderdate) AS VARCHAR)
                   END AS fecha_raw
            FROM orders)
        SELECT o_orderkey, fecha_raw,
               CASE WHEN LENGTH(SPLIT_PART(fecha_raw, '/', 3)) = 2
                    THEN SPLIT_PART(fecha_raw, '/', 1) || '/' ||
                         SPLIT_PART(fecha_raw, '/', 2) || '/20' ||
                         SPLIT_PART(fecha_raw, '/', 3)
                    ELSE fecha_raw END AS fecha_fixed
        FROM raw
    """,
    tags=("functions", "case"),
)
def two_digit_year_repair(spark, sf_dir):
    """P8: the CASE WHEN LENGTH(SPLIT_PART(...))=2 year repair the reference
    embeds in its watermark SQL
    (`/root/reference/extract_data_pdf/lambda_function.py:56-71`). Half the
    rows are synthesized in the two-digit dialect, half already four-digit."""
    o = T(spark, sf_dir, "orders")
    two = F.concat(
        F.dayofmonth("o_orderdate").cast("string"),
        F.lit("/"),
        F.month("o_orderdate").cast("string"),
        F.lit("/"),
        F.substring(F.year("o_orderdate").cast("string"), 3, 2),
    )
    four = F.concat(
        F.dayofmonth("o_orderdate").cast("string"),
        F.lit("/"),
        F.month("o_orderdate").cast("string"),
        F.lit("/"),
        F.year("o_orderdate").cast("string"),
    )
    raw = F.when(F.col("o_orderkey") % 2 == 0, two).otherwise(four)
    return o.select(
        "o_orderkey",
        raw.alias("fecha_raw"),
        fix_two_digit_year(raw).alias("fecha_fixed"),
    )


@query(
    "money_parse_roundtrip",
    oracle="""
        WITH raw AS (
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_orderkey % 2 = 0 THEN 'U$S ' ELSE '$' END ||
                   REPLACE(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR), '.', ',')
                       AS monto_raw
            FROM lineitem)
        SELECT l_orderkey, l_linenumber, monto_raw,
               CAST(CAST(TRIM(REPLACE(REPLACE(REPLACE(REPLACE(monto_raw, 'U$S ', ''), '$', ''), '.', ''), ',', '.')) AS DECIMAL(12,2)) AS DOUBLE) AS monto,
               CASE WHEN monto_raw LIKE '%U$S%' THEN 'USD'
                    WHEN monto_raw LIKE '%$%' THEN 'ARS'
                    ELSE NULL END AS divisa
        FROM raw
    """,
    tags=("functions", "money"),
)
def money_parse_roundtrip(spark, sf_dir):
    """F9: parse_money + currency_of over synthesized latam money strings
    ('$1234,56' / 'U$S 1234,56') — the `parse_monto` logic at
    `/root/reference/transform_data_bank_pay/lambda_function.py:9-20` as a
    codegen'd expression, round-tripped through the real price column."""
    # r13: the parse is regex-heavy per row and the scan plans ~3 tasks;
    # fan out (projected to the three needed columns first, guide §2.3)
    # so the string battery runs wide — A/B min 0.65 s vs 1.28 s plain.
    li = fan_out(
        T(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        ),
        "l_orderkey",
    )
    body = F.translate(
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string"), ".", ","
    )
    raw = F.concat(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit("U$S ")).otherwise(F.lit("$")), body
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        raw.alias("monto_raw"),
        parse_money(raw).cast("double").alias("monto"),
        currency_of(raw).alias("divisa"),
    )


@query(
    "hash_identity",
    oracle="""
        SELECT o_orderkey,
               MD5(CAST(o_orderkey AS VARCHAR) || '_' || o_orderstatus || '_' || o_orderpriority)
                   AS pay_id,
               SHA256(o_orderpriority) AS content_fp
        FROM orders
    """,
    tags=("functions", "hash"),
)
def hash_identity(spark, sf_dir):
    """F17: the md5 natural-key recipe
    (`/root/reference/transform_data_bank_pay/lambda_function.py:53-54`) and
    sha256 content fingerprint (`transform_data_pdf/lambda_function.py:9-10`)."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        payment_id("o_orderkey", "o_orderstatus", "o_orderpriority").alias("pay_id"),
        F.sha2("o_orderpriority", 256).alias("content_fp"),
    )


@query(
    "epoch_millis_roundtrip",
    oracle="""
        SELECT event_id,
               EPOCH_MS(ts) AS ts_millis,
               MAKE_TIMESTAMP(EPOCH_MS(ts) * 1000) AS ts_from_millis
        FROM events
    """,
    tags=("functions", "date"),
)
def epoch_millis_roundtrip(spark, sf_dir):
    """F12: epoch-millis ↔ timestamp (Gmail internalDate handling,
    `/root/reference/extract_data_pdf/lambda_function.py:121`)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_millis("ts").alias("ts_millis"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_from_millis"),
    )


@query(
    "json_field_access",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               COALESCE(CAST(json_extract_string(props, '$.missing') AS BIGINT), -1) AS missing_k
        FROM events
    """,
    tags=("functions", "json"),
)
def json_field_access(spark, sf_dir):
    """F19/F20: json get + coalesce default (the webhook body .get() chains,
    `/root/reference/webhook_mp_report/lambda_function.py:20-43`)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.coalesce(
            F.get_json_object("props", "$.missing").cast("long"), F.lit(-1)
        ).alias("missing_k"),
    )


@query(
    "time_padding",
    oracle="""
        SELECT event_id,
               STRFTIME(ts, '%H:%M') AS hora_raw,
               STRFTIME(ts, '%H:%M') || ':00' AS hora_padded
        FROM events
    """,
    tags=("functions", "time"),
)
def time_padding(spark, sf_dir):
    """F14: 'HH:MM' → 'HH:MM:SS' padding
    (`/root/reference/load_data/lambda_function.py:205-206`)."""
    e = T(spark, sf_dir, "events")
    hora = F.date_format("ts", "HH:mm")
    return e.select(
        "event_id",
        hora.alias("hora_raw"),
        pad_time(hora).alias("hora_padded"),
    )


@query(
    "regex_functions",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
               len(regexp_extract_all(p_type, '[AEIOU]')) AS n_vowels,
               regexp_matches(p_type, 'STEEL$') AS is_steel_family,
               regexp_replace(p_name, '\\s+', '_', 'g') AS name_snake,
               array_to_string(regexp_extract_all(p_type, '[A-Z]+'), ',') AS type_words
        FROM part
    """,
    tags=("functions", "regex"),
)
def regex_functions(spark, sf_dir):
    """Regex family (F4/F6/F7 generalized): extract / extract_all / count /
    anchored match / global replace. All row-level JVM expressions — at
    100 TB these fuse into the scan's codegen stage; no Python touches the
    hot path."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_brand"), r"#(\d+)", 1).alias("brand_num"),
        F.regexp_count(F.col("p_type"), F.lit("[AEIOU]")).cast("long").alias("n_vowels"),
        F.col("p_type").rlike("STEEL$").alias("is_steel_family"),
        F.regexp_replace(F.col("p_name"), r"\s+", "_").alias("name_snake"),
        F.array_join(
            F.regexp_extract_all(F.col("p_type"), F.lit("[A-Z]+"), 0), ","
        ).alias("type_words"),
    )


@query(
    "timezone_conversion",
    oracle="""
        SELECT event_id,
               CAST(ts AS TIMESTAMP) AS ts_utc,
               ts - INTERVAL 3 HOUR AS ts_buenos_aires,
               CAST(strftime(ts - INTERVAL 3 HOUR, '%Y-%m-%d') AS VARCHAR) AS local_date,
               CAST(EXTRACT(hour FROM ts - INTERVAL 3 HOUR) AS INT) AS local_hour
        FROM events
    """,
    tags=("functions", "date", "timezone"),
)
def timezone_conversion(spark, sf_dir):
    """F13 locale nuance: the reference's data is Argentina-local while its
    lambdas run in UTC (`datetime.now()` vs mail timestamps). Spark keeps
    timestamps UTC-normalized and converts at the edge with
    from_utc_timestamp. America/Argentina/Buenos_Aires is fixed UTC-3 (no
    DST since 2009), which the oracle mirrors as a plain 3-hour shift —
    the IANA lookup and the interval arithmetic must agree exactly."""
    e = T(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts"), "America/Argentina/Buenos_Aires")
    return e.select(
        "event_id",
        F.col("ts").alias("ts_utc"),
        local.alias("ts_buenos_aires"),
        F.date_format(local, "yyyy-MM-dd").alias("local_date"),
        F.hour(local).alias("local_hour"),
    )


@query(
    "null_handling_functions",
    oracle="""
        SELECT o_orderkey,
               NULLIF(o_orderstatus, 'O') AS status_or_null,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_defaulted,
               CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT NULL
                    THEN 'CLOSED-ISH' ELSE 'OPEN' END AS nvl2_equiv,
               (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open,
               IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'floor') AS prio_or_floor
        FROM orders
    """,
    tags=("functions", "nulls"),
)
def null_handling_functions(spark, sf_dir):
    """The NULL algebra the loaders lean on (format_value → SQL NULL,
    `/root/reference/load_data/lambda_function.py:6-13`): nullif / coalesce /
    nvl2 / isnull / ifnull as column expressions."""
    o = T(spark, sf_dir, "orders")
    s_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        s_null.alias("status_or_null"),
        F.coalesce(s_null, F.lit("OPEN")).alias("status_defaulted"),
        F.nvl2(s_null, F.lit("CLOSED-ISH"), F.lit("OPEN")).alias("nvl2_equiv"),
        F.isnull(s_null).alias("is_open"),
        F.ifnull(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("floor")).alias(
            "prio_or_floor"
        ),
    )


@query(
    "try_arithmetic_safety",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN CAST(l_quantity AS BIGINT) - 1 = 0 THEN NULL
                    ELSE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
                         / (CAST(l_quantity AS BIGINT) - 1) END AS price_per_extra_unit,
               TRY_CAST(l_returnflag AS BIGINT) AS flag_as_number,
               TRY_CAST(CAST(l_quantity AS VARCHAR) AS BIGINT) AS qty_roundtrip
        FROM lineitem
    """,
    tags=("functions", "arithmetic", "nulls"),
)
def try_arithmetic_safety(spark, sf_dir):
    """ANSI-safe arithmetic (F16 hardened): try_divide yields NULL on /0
    (quantity 1 → zero denominator) and try_cast yields NULL on garbage —
    the loaders' silent-skip behavior without disabling ANSI mode globally,
    and without the crash a 100 TB batch job cannot afford 90% through."""
    li = T(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice").cast("decimal(18,2)").cast("double"), qty - 1
        ).alias("price_per_extra_unit"),
        F.col("l_returnflag").try_cast("bigint").alias("flag_as_number"),
        qty.cast("string").try_cast("bigint").alias("qty_roundtrip"),
    )


@query(
    "string_regex_functions",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               CAST(LENGTH(p_name) AS INTEGER) AS name_len,
               SPLIT_PART(p_type, ' ', 1) AS type_head,
               CONCAT_WS('-', p_brand, p_type) AS brand_type,
               SUBSTRING(p_name, 1, 5) AS name_prefix,
               REPLACE(p_name, ' ', '_') AS name_snake,
               STRPOS(p_name, 'a') AS first_a,
               TRIM(CONCAT('  ', p_name, ' ')) AS trimmed,
               ENDS_WITH(p_type, 'STEEL') AS is_steel,
               regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
               len(regexp_extract_all(p_type, '[AEIOU]')) AS n_vowels,
               regexp_matches(p_type, 'STEEL$') AS is_steel_family,
               array_to_string(regexp_extract_all(p_type, '[A-Z]+'), ',') AS type_words
        FROM part
    """,
    tags=("functions", "string", "regex"),
)
def string_regex_functions(spark, sf_dir):
    """F1-F8 plus the regex family in ONE scan-fused projection:
    split/concat/length/replace/trim/substring/locate/case/suffix and
    extract/extract_all/count/anchored-match — the full string surface the
    reference's parsers use (`/root/reference/transform_data_mp/
    lambda_function.py:23-47`). Pure row-level JVM expressions; at 100 TB
    they fuse into the parquet scan's codegen stage — consolidating the
    demos costs nothing at runtime and keeps the verified surface in one
    query."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.element_at(F.split("p_type", " "), 1).alias("type_head"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.locate("a", F.col("p_name")).cast("long").alias("first_a"),
        F.trim(F.concat(F.lit("  "), "p_name", F.lit(" "))).alias("trimmed"),
        F.col("p_type").endswith("STEEL").alias("is_steel"),
        F.regexp_extract(F.col("p_brand"), r"#(\d+)", 1).alias("brand_num"),
        F.regexp_count(F.col("p_type"), F.lit("[AEIOU]")).cast("long").alias("n_vowels"),
        F.col("p_type").rlike("STEEL$").alias("is_steel_family"),
        F.array_join(
            F.regexp_extract_all(F.col("p_type"), F.lit("[A-Z]+"), 0), ","
        ).alias("type_words"),
    )


@query(
    "temporal_scalar_functions",
    oracle="""
        SELECT event_id,
               EPOCH_MS(ts) AS ts_millis,
               MAKE_TIMESTAMP(EPOCH_MS(ts) * 1000) AS ts_from_millis,
               STRFTIME(ts, '%H:%M') AS hora_raw,
               STRFTIME(ts, '%H:%M') || ':00' AS hora_padded,
               ts - INTERVAL 3 HOUR AS ts_buenos_aires,
               CAST(strftime(ts - INTERVAL 3 HOUR, '%Y-%m-%d') AS VARCHAR) AS local_date,
               CAST(EXTRACT(hour FROM ts - INTERVAL 3 HOUR) AS INT) AS local_hour
        FROM events
    """,
    tags=("functions", "date", "time", "timezone"),
)
def temporal_scalar_functions(spark, sf_dir):
    """F12 + F14 + the timezone edge in ONE events projection: epoch-millis
    roundtrip (Gmail internalDate, `/root/reference/extract_data_pdf/
    lambda_function.py:121`), 'HH:MM'→'HH:MM:SS' padding
    (`load_data/lambda_function.py:205-206`), and UTC→America/Argentina/
    Buenos_Aires conversion (fixed UTC-3, no DST since 2009 — the oracle
    mirrors it as a plain 3-hour shift). Row-local, scan-fused."""
    e = T(spark, sf_dir, "events")
    hora = F.date_format("ts", "HH:mm")
    local = F.from_utc_timestamp(F.col("ts"), "America/Argentina/Buenos_Aires")
    return e.select(
        "event_id",
        F.unix_millis("ts").alias("ts_millis"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_from_millis"),
        hora.alias("hora_raw"),
        pad_time(hora).alias("hora_padded"),
        local.alias("ts_buenos_aires"),
        F.date_format(local, "yyyy-MM-dd").alias("local_date"),
        F.hour(local).alias("local_hour"),
    )


@query(
    "codec_hash_functions",
    oracle="""
        SELECT doc_id,
               MD5(CAST(doc_id AS VARCHAR) || '_' || lang || '_' || source) AS pay_id,
               sha256(substring(text, 1, 24)) AS sha,
               base64(encode(substring(text, 1, 24))) AS b64,
               REPLACE(REPLACE(base64(encode(substring(text, 1, 24))), '+', '-'),
                       '/', '_') AS b64_urlsafe,
               decode(from_base64(base64(encode(substring(text, 1, 24))))) AS back
        FROM documents
    """,
    tags=("functions", "hash", "codec"),
)
def codec_hash_functions(spark, sf_dir):
    """F17 + F18 in ONE documents projection: the md5 natural-key recipe
    (`/root/reference/transform_data_bank_pay/lambda_function.py:53-54`),
    sha-256 content fingerprint (`transform_data_pdf/lambda_function.py:9-10`),
    and base64/urlsafe-base64 encode+decode roundtrip (the reference decodes
    urlsafe-b64 mail bodies, `extract_data_pdf/lambda_function.py:129`).
    Pure codegen'd expressions — fuse into the scan stage."""
    d = T(spark, sf_dir, "documents")
    head = F.substring("text", 1, 24)
    b64 = F.base64(F.encode(head, "UTF-8"))
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws("_", F.col("doc_id").cast("string"), "lang", "source")
        ).alias("pay_id"),
        F.sha2(head, 256).alias("sha"),
        b64.alias("b64"),
        F.translate(b64, "+/", "-_").alias("b64_urlsafe"),
        F.decode(F.unbase64(b64), "UTF-8").alias("back"),
    )


@query(
    "agg_bitwise_flags",
    oracle="""
        SELECT event_type,
               BIT_OR(CAST(user_id % 64 AS BIGINT)) AS flags_union,
               BIT_AND(CAST(user_id % 64 + 64 AS BIGINT)) AS flags_common,
               BIT_XOR(CAST(user_id AS BIGINT)) AS parity_fold
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise_flags(spark, sf_dir):
    """Bitwise aggregates (bit_or/bit_and/bit_xor): flag-set union /
    intersection / parity folds — exact integer ops, associative and
    commutative, so partial aggregation distributes freely."""
    ev = T(spark, sf_dir, "events")
    u = F.col("user_id").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_or(u % 64).alias("flags_union"),
            F.bit_and(u % 64 + 64).alias("flags_common"),
            F.bit_xor(u).alias("parity_fold"),
        )
        .orderBy("event_type")
    )
