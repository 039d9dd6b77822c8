"""Date/time repair expressions (SURVEY.md §2.9 F10-F14).

All pure Column compositions — Catalyst constant-folds and codegens them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fix_two_digit_year(col: Column | str) -> Column:
    """'26/04/25' → '26/04/2025'; 4-digit years pass through.

    The CASE WHEN LENGTH(SPLIT_PART(fecha,'/',3))=2 THEN '20'||… repair the
    reference embeds in its watermark SQL
    (`/root/reference/extract_data_pdf/lambda_function.py:56-71`, P8).
    """
    c = _c(col)
    parts = F.split(c, "/")
    # F.get (0-based) returns NULL out-of-bounds; element_at would raise
    # under ANSI mode on malformed input
    year = F.get(parts, 2)
    fixed = F.concat(F.get(parts, 0), F.lit("/"), F.get(parts, 1), F.lit("/20"), year)
    return F.when(F.length(year) == 2, fixed).otherwise(c)


def to_date_dayfirst(col: Column | str) -> Column:
    """Day-first parse after year repair — `TO_DATE(...,'DD/MM/YYYY')`
    (`/root/reference/extract_data_pdf/lambda_function.py:67`,
    `load_data/lambda_function.py:203`). try_to_date: malformed → NULL."""
    return F.try_to_date(fix_two_digit_year(col), "d/M/yyyy")


def pad_time(col: Column | str) -> Column:
    """'19:44' → '19:44:00' (len-guarded), as in
    `/root/reference/load_data/lambda_function.py:205-206` (F14). Spark has
    no TIME type; the engine stores HH:MM:SS strings (documented deviation,
    SURVEY.md §1.2)."""
    c = _c(col)
    return F.when(F.length(c) == 5, F.concat(c, F.lit(":00"))).otherwise(c)


def ts_from_epoch_millis(col: Column | str) -> Column:
    """Gmail internalDate millis → timestamp
    (`/root/reference/extract_data_pdf/lambda_function.py:121`, F12)."""
    return F.timestamp_millis(_c(col).cast("long"))
