"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at a given
scale factor, then compares row count, column names, and an
order-insensitive value comparison (rows sorted after stringifying with a
canonical format). Exits nonzero if anything mismatches, printing the first
few differing rows — the fast feedback loop while building the inventory.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from etl_expenses_spark.plans import REGISTRY  # noqa: E402
from etl_expenses_spark.session import get_spark  # noqa: E402
from etl_expenses_spark.sources.readers import TESTDATA_TABLES  # noqa: E402


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


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
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
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
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
