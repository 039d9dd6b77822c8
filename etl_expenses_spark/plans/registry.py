"""Registry binding each engine operator to (a) its DataFrame plan and
(b) its ANSI-SQL oracle twin for the DuckDB correctness gate.

Contract (driver's __spark_entry__): the Spark result and the oracle result
must agree on row count, schema (column names), and an order-insensitive
value hash. Two determinism rules keep doubles bit-identical across engines:

1. Never SUM/AVG raw doubles — cast to decimal first (exact, associative);
   derive averages as ``cast(sum_dec as double) / count`` (both engines then
   perform the identical IEEE ops).
2. Any top-k / limit query must impose a TOTAL order (unique tiebreaker
   column) so both engines pick the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    build: Builder
    oracle: str | None  # None → driver falls back to rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    # Non-empty for generated golden-literal oracles (tools/gen_goldens.py):
    # the scale factors whose output the VALUES branches pin. At any other
    # SF the oracle has no branch, so the local gate treats the query as
    # rows-only instead of reporting a spurious mismatch. The driver checks
    # at sf0.01, which every golden pins.
    golden_sfs: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Drop the PREVIOUS query's tracked caches (this build's result
            # hasn't been collected yet, so its own caches must stay live).
            from etl_expenses_spark.caching import clear_tracked_caches

            clear_tracked_caches()
            return fn(spark, sf_dir)

        build.__doc__ = fn.__doc__
        build.__name__ = fn.__name__
        build.__module__ = fn.__module__
        # expose the undecorated builder so tools can map a query to its
        # implementing source files (tools/bench_compare.py sentinel mode
        # walks the import closure of the plan function's module + body)
        build.__wrapped__ = fn
        REGISTRY[name] = Query(
            name=name, build=build, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco
