"""Generate golden-literal VALUES oracles for deterministic rows-only queries.

Some registry queries compute things ANSI SQL cannot re-derive — banded LSH
bucket collisions, HLL sketch estimates, PQ codebook assignments, k-means
refinement — so they had no DuckDB oracle and the driver only row-counted
them. But their outputs ARE deterministic (seeded sampling, ordered
tie-breaks), so the next-best gate is a pinned literal: run the query once
per scale factor, snapshot the rows into a VALUES table branched on the
scale factor (detected from COUNT(*) of a base table), and let the standard
compare machinery check count + schema + bit-exact values against it.

A golden is a REGRESSION pin, not an independent derivation — it certifies
"the output is exactly what it was when reviewed", while the semantic
correctness of that snapshot is covered by the operator's pytest properties
(planted duplicates found, recall@k floors, codebook round-trips).

Determinism is verified before pinning: each query runs twice per SF and
the tool refuses to emit a golden if the two runs differ.

Usage: python tools/gen_goldens.py [query ...]   (default: all GOLDEN_TARGETS)
Writes etl_expenses_spark/plans/goldens/<name>.sql, which
plans/__init__._attach_goldens() picks up at import time.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

from etl_expenses_spark.plans import REGISTRY  # noqa: E402
from etl_expenses_spark.session import get_spark  # noqa: E402

# scale factor -> (sf tag, orders row count used as the branch key)
SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
}

GOLDEN_TARGETS: list[str] = [
    # EMPTY since r12 — every registered query carries a COMPUTED oracle.
    # Conversion history: r11 moved twelve goldens (iterative graph pins
    # as recursive CTEs, MMR/BPE/sha256 replays, four sketch bound
    # checks); r12 moved the final fourteen — the LSH family + ANN top-k
    # tiers as planted-corpus RECALL PROOFS, the k-means descendants as
    # bound checks, catalog_inventory vs information_schema, the CDC
    # delta probe's planted pairs, the full curation funnel replayed in
    # SQL (true-Jaccard stage 4), and semantic_dedup_prune's closed-form
    # decision vector. The tool remains for any future operator whose
    # output is deterministic but genuinely non-derivable.
]

_DUCK_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
    "double": "DOUBLE",
    "float": "REAL",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "array<int>": "INTEGER[]",
    "array<bigint>": "BIGINT[]",
    "array<float>": "REAL[]",
    "array<double>": "DOUBLE[]",
    "array<string>": "VARCHAR[]",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "'NaN'::DOUBLE"
        # varchar→double is a correctly-rounded parse; a bare literal would
        # be read as DECIMAL first and the DECIMAL→DOUBLE cast can be off
        # by one ulp from the value repr() printed
        return f"'{v!r}'::DOUBLE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return f"'{v.isoformat()}'"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_lit(x) for x in v) + "]"
    return str(v)


def build_golden(name: str, spark) -> str | None:
    q = REGISTRY[name]
    branches = []
    sfs = []
    for sf, sf_dir in SF_DIRS.items():
        df1 = q.build(spark, sf_dir)
        cols = df1.columns
        types = [f.dataType.simpleString() for f in df1.schema.fields]
        key = lambda r: tuple(str(c) for c in r)  # noqa: E731 — None-safe sort
        rows1 = sorted((tuple(x) for x in df1.collect()), key=key)
        rows2 = sorted((tuple(x) for x in q.build(spark, sf_dir).collect()), key=key)
        if [key(r) for r in rows1] != [key(r) for r in rows2]:
            print(f"SKIP {name}: nondeterministic at sf{sf}")
            return None
        duck_types = []
        for t in types:
            if t not in _DUCK_TYPES:
                print(f"SKIP {name}: unsupported type {t}")
                return None
            duck_types.append(_DUCK_TYPES[t])
        select_cols = ", ".join(
            f"CAST({c} AS {dt}) AS {c}" for c, dt in zip(cols, duck_types)
        )
        values = ",\n            ".join(
            "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows1
        )
        if not values:
            values = "(" + ", ".join("NULL" for _ in cols) + ")"
            empty_guard = " WHERE FALSE"
        else:
            empty_guard = ""
        # branch key: orders row count identifies the scale factor
        import duckdb

        n_orders = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SF_DIRS[sf]}/orders.parquet')"
        ).fetchone()[0]
        branches.append(
            f"        SELECT {select_cols}\n"
            f"        FROM (VALUES\n            {values}\n"
            f"        ) AS t({', '.join(cols)})\n"
            f"        WHERE (SELECT COUNT(*) FROM orders) = {n_orders}{empty_guard}"
        )
        sfs.append(sf)
    header = (
        f"-- AUTO-GENERATED by tools/gen_goldens.py — golden-literal oracle for\n"
        f"-- {name}: pins the seed-deterministic output (verified identical over\n"
        f"-- two runs) at each covered scale factor; regression pin, semantics\n"
        f"-- covered by the operator's pytest properties.\n"
        f"-- golden_sfs: {', '.join(sfs)}\n"
    )
    return header + "\nUNION ALL\n".join(branches) + "\n"


def main() -> int:
    targets = sys.argv[1:] or GOLDEN_TARGETS
    spark = get_spark("gen_goldens")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "etl_expenses_spark",
        "plans",
        "goldens",
    )
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for name in targets:
        sql = build_golden(name, spark)
        if sql is None:
            continue
        path = os.path.join(out_dir, f"{name}.sql")
        with open(path, "w") as f:
            f.write(sql)
        print(f"wrote {path}")
        written += 1
    print(f"{written}/{len(targets)} goldens written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
