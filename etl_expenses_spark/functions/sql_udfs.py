"""SQL UDFs (Spark 4 ``CREATE FUNCTION ... RETURN expr``): the expression
library exposed to the SQL-text surface.

The NL→SQL agent (EP3) can only call what the SQL dialect names. Spark 4's
SQL UDFs let the engine register its reusable expressions — money parsing
(F9), two-digit-year repair (P8), time padding (F14) — as catalog functions,
so generated SQL reuses the exact same logic the DataFrame surface uses.
Being ``RETURN <expression>`` definitions (not procedural bodies), Catalyst
inlines them into the calling plan: they codegen like hand-written
expressions, zero call overhead, and predicates over them still push down.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Keep these textually in sync with the Column versions in money.py/dates.py
# (tests assert behavioral equality on adversarial inputs).
_DEFS = {
    "parse_money_sql": """
        CREATE OR REPLACE TEMPORARY FUNCTION parse_money_sql(s STRING)
        RETURNS DECIMAL(12,2)
        RETURN try_cast(trim(translate(regexp_replace(
                   s, '^\\\\s*(U\\\\$S|US\\\\$|USD|ARS\\\\$|AR\\\\$|\\\\$)\\\\s*', ''),
               ',.', '.')) AS DECIMAL(12,2))
    """,
    "currency_of_sql": """
        CREATE OR REPLACE TEMPORARY FUNCTION currency_of_sql(s STRING)
        RETURNS STRING
        RETURN CASE
            WHEN contains(s, 'U$S') OR contains(s, 'US$') OR contains(s, 'USD')
                THEN 'USD'
            WHEN contains(s, '$') THEN 'ARS'
            ELSE CAST(NULL AS STRING) END
    """,
    "fix_two_digit_year_sql": """
        CREATE OR REPLACE TEMPORARY FUNCTION fix_two_digit_year_sql(f STRING)
        RETURNS STRING
        RETURN CASE WHEN length(split_part(f, '/', 3)) = 2
                    THEN split_part(f, '/', 1) || '/' || split_part(f, '/', 2)
                         || '/20' || split_part(f, '/', 3)
                    ELSE f END
    """,
}


def register_sql_udfs(spark: SparkSession) -> list[str]:
    """Install the SQL-surface function library; returns the names."""
    for ddl in _DEFS.values():
        spark.sql(ddl)
    return list(_DEFS)
