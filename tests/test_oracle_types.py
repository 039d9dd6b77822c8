"""Oracle output-type hygiene — the guard for the round-3 HUGEINT class.

The driver's value hash is TYPE-sensitive: DuckDB promotes SUM(BIGINT) and
HUGEINT `//` results to HUGEINT, which Arrow renders as decimal128(38,0),
while the Spark twin emits int64 — equal values, different hashes, red
driver row. Round 3 shipped 13 such oracles (3 caught by the rotation, 10
latent). This test runs EVERY registry oracle through DuckDB at sf0.01 and
asserts no output column arrives as HUGEINT/UHUGEINT (decimal128(38,0)) or
decimal256 — the convention is `CAST(... AS BIGINT)` on every summed /
integer-divided output column (`plans/retrieval_ops.py` bm25 score set the
pattern). tools/check_oracle.py additionally cross-checks the full Spark
schema against each oracle's Arrow schema; this pytest pins the DuckDB-only
half so the class cannot re-enter through a new query.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from etl_expenses_spark.plans import REGISTRY
from etl_expenses_spark.sources.readers import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.01"

# Queries whose oracle legitimately emits a wide decimal BECAUSE the Spark
# side emits the identical decimal type (none today — additions must prove
# the Spark twin's schema matches).
_ALLOWED_WIDE_DECIMAL: set[str] = set()


def _hugeint_cols(schema: pa.Schema) -> list[str]:
    bad = []
    for f in schema:
        t = f.type
        if pa.types.is_decimal(t) and t.precision > 18 and t.scale == 0:
            bad.append(f"{f.name}: {t}")
        elif isinstance(t, pa.Decimal256Type):
            bad.append(f"{f.name}: {t}")
    return bad


def test_no_oracle_emits_hugeint_columns():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders = {}
    for name, q in REGISTRY.items():
        if q.oracle is None or name in _ALLOWED_WIDE_DECIMAL:
            continue
        if q.golden_sfs and "0.01" not in q.golden_sfs:
            continue
        try:
            schema = con.execute(q.oracle).arrow().schema
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"{name}: oracle failed under DuckDB: {e}")
        bad = _hugeint_cols(schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting HUGEINT/wide-decimal output columns (driver hash "
        f"is type-sensitive — CAST AS BIGINT): {offenders}"
    )
