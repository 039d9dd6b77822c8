"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at a given
scale factor, then compares row count, column names, and an
order-insensitive value comparison (rows sorted after stringifying with a
canonical format). Exits nonzero if anything mismatches, printing the first
few differing rows — the fast feedback loop while building the inventory.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --window [--vanilla] [sf_dir]
           # exactly the driver's recorded set: first 50 queries() entries
       python tools/check_oracle.py --lint-window
           # harness-eligibility lint: every _PRIORITY query's output schema
           # must be free of array/struct/map columns (the driver harness
           # canonicalizes via pandas sort_values, which crashes on
           # unhashable cells — the r4 inverted_index_postings err)
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from etl_expenses_spark.plans import REGISTRY  # noqa: E402
from etl_expenses_spark.session import get_spark  # noqa: E402
from etl_expenses_spark.sources.readers import TESTDATA_TABLES  # noqa: E402


def arrow_canon(t):
    """Canonical type tag for a DuckDB-result Arrow type."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{arrow_canon(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_canon(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def spark_canon(dt):
    """Canonical type tag for a Spark type — same vocabulary as arrow_canon,
    so long<->int64, int<->int32, double<->float64 line up and anything else
    (notably DuckDB HUGEINT -> decimal(38,0) where Spark says int64) FAILs."""
    import pyspark.sql.types as st

    if isinstance(dt, st.LongType):
        return "int64"
    if isinstance(dt, st.IntegerType):
        return "int32"
    if isinstance(dt, st.ShortType):
        return "int16"
    if isinstance(dt, st.ByteType):
        return "int8"
    if isinstance(dt, st.DoubleType):
        return "double"
    if isinstance(dt, st.FloatType):
        return "float"
    if isinstance(dt, st.BooleanType):
        return "boolean"
    if isinstance(dt, st.StringType):
        return "string"
    if isinstance(dt, st.BinaryType):
        return "binary"
    if isinstance(dt, st.DateType):
        return "date"
    if isinstance(dt, (st.TimestampType, st.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, st.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, st.ArrayType):
        return f"array<{spark_canon(dt.elementType)}>"
    if isinstance(dt, st.StructType):
        inner = ",".join(f"{f.name}:{spark_canon(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    return dt.simpleString()


def type_mismatches(spark_schema, arrow_schema):
    """Per-column canonical-type diffs between a Spark result schema and the
    oracle's Arrow schema (matched by column name). The driver's value hash
    is type-sensitive, so the local gate must be too."""
    sp = {f.name: spark_canon(f.dataType) for f in spark_schema.fields}
    ar = {f.name: arrow_canon(f.type) for f in arrow_schema}
    return [
        f"{name}: spark={sp[name]} duck={ar[name]}"
        for name in sorted(set(sp) & set(ar))
        if sp[name] != ar[name]
    ]


def coerce_oracle_decimals(tbl):
    """Driver-faithful decimal handling (r9 hash-mismatch root cause).

    The driver canonicalizes both result sets through pandas: DuckDB's
    ``.df()`` renders decimal columns as float64, while Spark's collect /
    toPandas keeps decimal.Decimal objects — so a decimal-typed output
    column stringifies as '1234.5' on the oracle side and '1234.50' on the
    Spark side and can NEVER hash-match, even when the values are equal
    (CORRECTNESS_r09 `incremental_agg_state_merge`: rows/schema green,
    hash red). This local gate previously compared str(Decimal) ==
    str(Decimal) symmetrically and wrongly passed. Reproduce the driver:
    cast every decimal column of the oracle's Arrow table to float64, so
    any query whose Spark side still emits raw decimals fails locally
    first (type check: decimal vs double). Pinned by
    tests/test_oracle_gate.py."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols, fields = [], []
    for field, col in zip(tbl.schema, tbl.columns):
        if pa.types.is_decimal(field.type):
            col = pc.cast(col, pa.float64())
            field = pa.field(field.name, pa.float64())
        cols.append(col)
        fields.append(field)
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))


def canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we demand bit-identical doubles
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def _window_names() -> list[str]:
    """The driver's recorded set: first 50 queries() entries."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries())[:50]


def complex_output_columns(schema) -> list[str]:
    """Columns the driver harness cannot canonicalize (pandas sort_values
    raises `unhashable type` on list/dict cells)."""
    import pyspark.sql.types as st

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (st.ArrayType, st.StructType, st.MapType))
    ]


def lint_window() -> int:
    """Reject array/struct/map-typed output columns from the driver window,
    so a harness-incompatible query can never occupy a driver slot again
    (VERDICT r4 "What's wrong" #1). Schema analysis only — no job runs."""
    names = _window_names()
    spark = get_spark("window_lint", cpus=4)
    bad = []
    for name in names:
        try:
            schema = REGISTRY[name].build(spark, "/root/testdata/sf0.001").schema
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"build error: {e}"))
            continue
        cols = complex_output_columns(schema)
        if cols:
            bad.append((name, f"harness-unsortable output columns: {cols}"))
    for name, msg in bad:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{len(names) - len(bad)}/{len(names)} window slots harness-safe")
    return 1 if bad else 0


def main() -> int:
    args = sys.argv[1:]
    if "--lint-window" in args:
        return lint_window()
    vanilla = "--vanilla" in args
    window = "--window" in args
    args = [a for a in args if a not in ("--vanilla", "--window")]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    if window:
        names = _window_names()
    else:
        names = [a for a in args if not a.startswith("/")] or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(REGISTRY)}")
        return 2

    if vanilla:
        # simulate the driver: a bare SparkSession with none of our tuned
        # confs — engine code must self-configure (readers.py:load_table)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("oracle_vanilla").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark("oracle_check", cpus=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in names:
        q = REGISTRY[name]
        try:
            sdf = q.build(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"ok    {name}: rows-only ({len(s_rows)} rows)")
            continue
        sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        if q.golden_sfs and sf_tag not in q.golden_sfs:
            # golden-literal oracle with no branch for this SF — value check
            # happens at the pinned SFs (driver checks 0.01, always pinned)
            print(f"ok    {name}: rows-only at sf{sf_tag} (golden pins {q.golden_sfs})")
            continue
        try:
            # one execution: rows AND schema come from the same Arrow result
            # (running the oracle twice doubled DuckDB time across the
            # registry — ADVICE r4)
            tbl = coerce_oracle_decimals(con.execute(q.oracle).arrow())
            d_cols = list(tbl.column_names)
            d_arrow = tbl.schema
            cols_py = [c.to_pylist() for c in tbl.columns]
            d_rows = list(zip(*cols_py))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            tdiff = type_mismatches(sdf.schema, d_arrow)
            if tdiff:
                problems.append(f"types: {'; '.join(tdiff)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            a, b = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(s_rows)} rows match oracle")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
