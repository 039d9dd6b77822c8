"""Shared helpers for the query inventory."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_expenses_spark.sources.readers import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


from etl_expenses_spark.caching import (  # noqa: F401  (re-export for plans)
    clear_tracked_caches,
    tracked_persist,
)


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast to decimal before aggregating.

    Summing doubles is order-dependent; summing decimals is exact and
    associative, so Spark (parallel partial aggregates) and the DuckDB oracle
    get bit-identical results.

    CAVEAT — only cast *clean* columns (values whose decimal representation
    already fits the target scale, e.g. 2-decimal prices). DuckDB converts
    double→decimal via the shortest decimal string while Spark uses a
    different path, and the engines disagree on tie rounding (HALF_EVEN vs
    HALF_UP) — so casting a computed ("dirty") double is not portable. Do
    arithmetic *in the decimal domain* instead (exact in both engines), and
    use FLOOR where explicit cent-truncation is wanted.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact decimal sum of a *clean* column, surfaced as double."""
    return F.sum(dec(col, scale, precision)).cast("double")
