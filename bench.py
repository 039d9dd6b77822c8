"""Benchmark harness — the driver runs this per round and records BENCH_r{N}.json.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect of the final —
usually small — result). A warmup query runs first so JVM/codegen startup
isn't billed to the first headline entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_expenses_spark.plans import REGISTRY
from etl_expenses_spark.session import get_spark

HEADLINE = [
    "flagship_spend_by_category",
    "pricing_summary",
    "join_inner_orders_customer",
    "join_left_order_counts",
    "rollup_spend",
    "window_latest_order_per_customer",
    "window_running_user_spend",
    "topk_orders",
    "count_distinct_suppliers",
    "money_parse_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warmup: JVM, codegen, parquet footer caches
    REGISTRY["topk_orders"].build(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        n = df.count() if name in ("money_parse_roundtrip", "derived_columns") else len(
            df.collect()
        )
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
