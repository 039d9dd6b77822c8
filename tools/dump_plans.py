"""Dump `explain("formatted")` for named registry queries to files.

Usage: python tools/dump_plans.py --out plans/r13 --suffix _before Q [Q ...]

The optimization-round deliverable: plans/r13/<query>_before.txt and
..._after.txt hold the physical plan of every query touched this round so
plan-shape claims in OPTIMIZATION_r13.md are checkable without running
Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_expenses_spark.plans import REGISTRY  # noqa: E402
from etl_expenses_spark.session import get_spark  # noqa: E402
from tools.explain_audit import plan_string  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    out_dir = "plans/r13"
    suffix = "_before"
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_string(df))
            f.write("\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
