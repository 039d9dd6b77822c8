"""Currency-string parsing as a pure Column expression.

Re-expresses the reference's ``parse_monto``
(`/root/reference/transform_data_bank_pay/lambda_function.py:9-20`): strip a
currency prefix out of {U$S, US$, USD, AR$, ARS$, $}, drop '.' thousands
separators, turn the ',' decimal comma into '.', and cast. Being a composed
built-in expression (regexp_replace chain + cast) it stays inside
whole-stage codegen — no UDF, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Longest-prefix-first so 'US$' wins over '$', mirroring the reference's
# ordered prefix list.
_PREFIX_RE = r"^\s*(U\$S|US\$|USD|ARS\$|AR\$|\$)\s*"


def parse_money(col: Column | str, scale: int = 2) -> Column:
    """'$1.234,56' / 'U$S 99,90' → decimal(12,scale). NULL if unparseable."""
    c = F.col(col) if isinstance(col, str) else col
    no_prefix = F.regexp_replace(c, _PREFIX_RE, "")
    # '1.234,56' → '1234.56' in ONE translate: ',' maps to '.', and '.'
    # (matching char with no replacement) is deleted — no regex engine,
    # no second pass over the string
    normalized = F.translate(no_prefix, ",.", ".")
    # try_cast: unparseable input → NULL (ANSI mode would raise), matching
    # the reference's silent-skip behavior
    return F.trim(normalized).try_cast(f"decimal(12,{scale})")


def currency_of(col: Column | str) -> Column:
    """'U$S …' → 'USD'; '$ …' → 'ARS'; else NULL — the conditional mapping at
    `/root/reference/transform_data_bank_pay/lambda_function.py:35` (P9)."""
    c = F.col(col) if isinstance(col, str) else col
    # contains ×3, not rlike: substring search skips the regex engine
    return (
        F.when(
            c.contains("U$S") | c.contains("US$") | c.contains("USD"), F.lit("USD")
        )
        .when(c.contains("$"), F.lit("ARS"))
        .otherwise(F.lit(None).cast("string"))
    )
