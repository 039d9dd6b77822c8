"""Schema coercion + inference cascade and row-level quality gates.

Re-expresses the reference's `convert_column_types`
(`/root/reference/redshift_to_bq/lambda_function.py:38-131`): a declared
dtype map applied first, then a numeric → integer/double → timestamp →
string inference cascade for unmapped columns. Here the cascade is decided
from a bounded sample (one aggregate over try_casts, no driver-side
per-value loops) and applied as column casts — fully declarative, so it
scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_dtype_map(df: DataFrame, dtype_map: dict[str, str]) -> DataFrame:
    """Cast declared columns (try_cast: un-coercible values → NULL, the
    reference's NaN-tolerant behavior)."""
    exprs = []
    for name in df.columns:
        if name in dtype_map:
            exprs.append(F.col(name).try_cast(dtype_map[name]).alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)


def infer_and_cast(df: DataFrame, sample_rows: int = 10_000) -> DataFrame:
    """Infer types for string columns via the reference's cascade:
    all-castable-to-long → long; else all-castable-to-double → double;
    else all-castable-to-timestamp → timestamp; else keep string.

    One aggregation pass over a bounded sample decides every column; the
    decision is then a plain cast (codegen'd) over the full data.
    """
    string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not string_cols:
        return df
    sample = df.limit(sample_rows)
    aggs = []
    for c in string_cols:
        nonnull = F.count(F.col(c))
        aggs += [
            nonnull.alias(f"{c}__n"),
            F.count(F.col(c).try_cast("long")).alias(f"{c}__long"),
            F.count(F.col(c).try_cast("double")).alias(f"{c}__double"),
            F.count(F.try_to_timestamp(F.col(c))).alias(f"{c}__ts"),
        ]
    stats = sample.agg(*aggs).collect()[0].asDict()

    def decide(c: str) -> str | None:
        n = stats[f"{c}__n"]
        if n == 0:
            return None
        if stats[f"{c}__long"] == n:
            return "long"
        if stats[f"{c}__double"] == n:
            return "double"
        if stats[f"{c}__ts"] == n:
            return "timestamp"
        return None

    exprs = []
    for name in df.columns:
        target = decide(name) if name in string_cols else None
        if target == "timestamp":
            exprs.append(F.try_to_timestamp(F.col(name)).alias(name))
        elif target is not None:
            exprs.append(F.col(name).try_cast(target).alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)


def normalize_columns(df: DataFrame, dialects: list[dict[str, str]]) -> DataFrame:
    """Header-dialect normalization, data-driven.

    The reference ingests the same MP settlement table under two header
    namings (English vs Spanish) and picks one by catching a KeyError on the
    other (`/root/reference/load_data/lambda_function.py:76-159`, Spanish
    names at `:137-151`). Exception-driven control flow doesn't survive a
    declarative planner, so here the dialect is *detected* from
    ``set(df.columns)`` and applied as a select-alias projection — zero-cost
    under Catalyst (collapses into the scan's ReadSchema).

    ``dialects``: list of {source_name: canonical_name} maps; the first map
    entirely contained in df.columns wins. Unmapped columns pass through.
    """
    cols = set(df.columns)
    for mapping in dialects:
        if set(mapping).issubset(cols):
            return df.select(
                *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
            )
    raise ValueError(
        f"no header dialect matches columns {sorted(cols)}; "
        f"known dialects: {[sorted(d) for d in dialects]}"
    )


def require_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """Row gate: drop rows missing any required field — the mail-row
    rejection at `/root/reference/transform_data_bank_pay/lambda_function.py:49-51`."""
    return df.na.drop(subset=fields)
