"""Driver-hash fidelity of the local correctness gate (r9 root cause).

CORRECTNESS_r09 recorded `incremental_agg_state_merge` as rows/schema green
but hash RED, while the local gate passed the identical query — the local
replica had stopped being a replica for decimal-typed outputs. Root cause:
the driver canonicalizes both result sets through pandas, where DuckDB's
`.df()` renders decimal columns as float64 but Spark's side keeps
decimal.Decimal objects, so equal values stringify differently
('1234.50' vs '1234.5') and the hash can never match. The old local gate
compared str(Decimal) == str(Decimal) symmetrically and wrongly passed.

These tests pin the fix in tools/check_oracle.py:

1. `coerce_oracle_decimals` reproduces the driver's coercion: every
   decimal column in the oracle's Arrow result becomes float64.
2. A decimal(38,2) output column — the exact r9 shape — now FAILS the
   local gate's type check (spark decimal vs duck double) even when the
   values are equal, so the gate can never again pass what the driver
   fails.
3. The repaired query itself emits no decimal columns on either side.
4. No registry query's SPARK schema emits a decimal output column
   (schema-only scan — the class is banned at the source).
"""

from __future__ import annotations

import decimal
import sys

import duckdb
import pyarrow as pa
import pyspark.sql.types as st

sys.path.insert(0, "/root/repo")

from etl_expenses_spark.plans import REGISTRY

sys.path.insert(0, "/root/repo/tools")
from check_oracle import (  # noqa: E402
    arrow_canon,
    canon,
    coerce_oracle_decimals,
    type_mismatches,
)

SF_DIR = "/root/testdata/sf0.001"


def test_coerce_oracle_decimals_matches_driver_pandas_path():
    """Arrow decimal columns coerce to float64, exactly like duckdb .df()."""
    con = duckdb.connect()
    tbl = con.execute(
        "SELECT CAST(1234.50 AS DECIMAL(38,2)) AS wide,"
        "       CAST(7.25 AS DECIMAL(18,2)) AS narrow,"
        "       CAST(3 AS BIGINT) AS n"
    ).arrow()
    out = coerce_oracle_decimals(tbl)
    assert pa.types.is_float64(out.schema.field("wide").type)
    assert pa.types.is_float64(out.schema.field("narrow").type)
    assert pa.types.is_int64(out.schema.field("n").type)  # untouched
    assert out.column("wide").to_pylist() == [1234.5]
    # the driver's own reference behavior: .df() gives float64 too
    df = con.execute("SELECT CAST(1234.50 AS DECIMAL(38,2)) AS wide").df()
    assert str(df["wide"].dtype) == "float64"


def test_decimal_output_column_fails_gate_even_with_equal_values():
    """The r9 shape: spark decimal(38,2) vs oracle decimal(38,2), equal
    values. Pre-fix the gate passed (str == str); post-fix the coerced
    oracle type is double, the type check flags it, and the cell-level
    canon strings diverge the same way the driver's hash did."""
    spark_schema = st.StructType(
        [st.StructField("total_spend", st.DecimalType(38, 2))]
    )
    oracle_tbl = coerce_oracle_decimals(
        duckdb.connect()
        .execute("SELECT CAST(1234.50 AS DECIMAL(38,2)) AS total_spend")
        .arrow()
    )
    diffs = type_mismatches(spark_schema, oracle_tbl.schema)
    assert diffs == ["total_spend: spark=decimal(38,2) duck=double"]
    # and even value-wise: Spark collects Decimal('1234.50'), the driver's
    # oracle side sees float 1234.5 — canon() must now expose the mismatch
    assert canon(decimal.Decimal("1234.50")) != canon(1234.5)


def test_incremental_agg_state_merge_pins_double_outputs(spark):
    sdf = REGISTRY["incremental_agg_state_merge"].build(spark, SF_DIR)
    types = {f.name: f.dataType for f in sdf.schema.fields}
    assert isinstance(types["n_orders"], st.LongType)
    assert isinstance(types["total_spend"], st.DoubleType)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS"
        f" SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    tbl = coerce_oracle_decimals(
        con.execute(REGISTRY["incremental_agg_state_merge"].oracle).arrow()
    )
    assert type_mismatches(sdf.schema, tbl.schema) == []
    assert arrow_canon(tbl.schema.field("total_spend").type) == "double"


def test_no_registry_query_emits_decimal_output(spark):
    """Schema-only sweep: raw decimal outputs are banned registry-wide —
    they can never be driver-hash-green (surface as .cast('double') or
    string; keep decimals internal for exactness)."""
    offenders = {}
    for name, q in REGISTRY.items():
        schema = q.build(spark, SF_DIR).schema
        decs = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, st.DecimalType)
        ]
        if decs:
            offenders[name] = decs
    assert not offenders, f"decimal output columns: {offenders}"
