"""Propose the next driver-correctness window (__spark_entry__._PRIORITY).

The driver records rows for the FIRST 50 ``queries()`` entries each round;
maximizing unique driver-verified queries over rounds means rotating the
window while never leaving a §2 family without a green in-window
representative. This tool makes that rotation systematic instead of
hand-curated:

1. GREENS: queries with hash_match=true in the latest CORRECTNESS_r*.json.
2. KEEP: a minimal green set covering every tag the latest round's greens
   covered (greedy set cover, preferring queries that cover many tags) —
   the per-family anchors.
3. FILL: the remaining slots go to never-driver-checked queries, greedy by
   least-covered tag so new families get checked first.

Prints a ready-to-paste _PRIORITY list plus the audit trail (what was
kept, what rotated in, what has still never been checked). The output is
a PROPOSAL — sanity-check swap-ins with
``tools/check_oracle.py --vanilla /root/testdata/sf0.01 <names>`` before
shipping, exactly as the hand rotation did.

Usage: python tools/rotate_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_expenses_spark.plans import REGISTRY  # noqa: E402


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not rounds:
        print("no CORRECTNESS_r*.json yet")
        return 1
    ever: set[str] = set()
    for f in rounds:
        ever |= set(json.load(open(f)))
    latest = json.load(open(rounds[-1]))
    greens = {n for n, r in latest.items() if r.get("hash_match")}

    tags = {n: set(REGISTRY[n].tags or ()) for n in REGISTRY}

    # greedy set cover: green anchors for every tag the greens cover
    to_cover = set().union(*(tags.get(n, set()) for n in greens)) if greens else set()
    keep: list[str] = []
    uncovered = set(to_cover)
    while uncovered:
        best = max(
            (n for n in greens if n not in keep),
            key=lambda n: len(tags.get(n, set()) & uncovered),
            default=None,
        )
        if best is None or not tags.get(best, set()) & uncovered:
            break
        keep.append(best)
        uncovered -= tags[best]

    never = [n for n in REGISTRY if n not in ever]
    # harness-eligibility lint: the driver canonicalizes results via pandas
    # sort_values, which crashes on array/struct/map cells (the r4
    # inverted_index_postings err) — such queries must never occupy a
    # window slot. Schema analysis only (sf0.001), no job execution.
    from etl_expenses_spark.session import get_spark
    from tools.check_oracle import complex_output_columns

    spark = get_spark("rotate_lint", cpus=4)
    ineligible: dict[str, list[str]] = {}

    def harness_safe(name: str) -> bool:
        if name in ineligible:
            return False
        try:
            schema = REGISTRY[name].build(spark, "/root/testdata/sf0.001").schema
        except Exception as e:  # noqa: BLE001
            ineligible[name] = [f"build error: {e}"]
            return False
        cols = complex_output_columns(schema)
        if cols:
            ineligible[name] = cols
            return False
        return True

    keep = [n for n in keep if harness_safe(n)]
    # fill greedily by least-covered tag for family diversity
    covered = set().union(*(tags[n] for n in keep)) if keep else set()
    fill: list[str] = []
    pool = [n for n in never if harness_safe(n)]
    while len(keep) + len(fill) < size and pool:
        best = max(pool, key=lambda n: len(tags.get(n, set()) - covered))
        fill.append(best)
        covered |= tags.get(best, set())
        pool.remove(best)
    window = (keep + fill)[:size]
    if ineligible:
        print("# excluded as harness-unsafe (array/struct/map output):")
        for n, cols in sorted(ineligible.items()):
            print(f"#   {n}: {cols}")

    print(f"# proposed _PRIORITY ({len(window)} slots: {len(keep)} green "
          f"anchors + {len(fill)} first-timers; {len(never) - len(fill)} "
          f"never-checked remain for future rounds)")
    print("_PRIORITY = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    print("\n# kept green anchors:", len(keep))
    print("# rotating in (never driver-checked):", len(fill))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
