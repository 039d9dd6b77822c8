"""Diff two bench result files and flag per-query regressions.

Accepts either bench.py's raw JSON line or the driver's BENCH_r{N}.json
wrapper (whose ``tail`` embeds the JSON line). Prints shared-set totals,
the per-query deltas beyond a threshold, and the load-average context if
present (a shared host can move every number 2-6x — see BENCH loadavg_1m).

Usage: python tools/bench_compare.py OLD NEW [--threshold 0.2]
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    # driver wrapper: JSON line inside "tail" (or any embedded line)
    hay = raw if d is None else d.get("tail", "")
    m = re.search(r'\{"metric".*?\}(?=\s*$|\s*\n)', hay, re.M)
    if not m:
        m = re.search(r'\{"metric".*\}', hay)
    if not m:
        raise SystemExit(
            f"bench_compare: {path} is neither a bench.py JSON line "
            '({"metric": ...}) nor a driver BENCH_r{N}.json wrapper with '
            "an embedded metric line"
        )
    return json.loads(m.group(0))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.2
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    ot, nt = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    print(f"shared {len(shared)} queries: {ot:.2f}s -> {nt:.2f}s "
          f"({nt / ot:.2f}x)" if ot else "no shared queries")
    contaminated = False
    for tag, d in (("old", old), ("new", new)):
        start = d.get("loadavg_start")
        finish = d.get("loadavg_1m")
        if start is not None or finish is not None:
            note = ""
            if start is not None and start >= 1.0:
                note = "  <-- CONTAMINATED (start load >= 1; deltas unusable)"
                contaminated = True
            print(f"  {tag} loadavg start={start} finish={finish}{note}")
    if contaminated:
        print("  NOTE: at least one run started under host load; treat the "
              "deltas below as load artifacts, not code changes.")
    worse = [(k, oq[k], nq[k]) for k in shared if nq[k] > oq[k] * (1 + thr)]
    better = [(k, oq[k], nq[k]) for k in shared if nq[k] < oq[k] * (1 - thr)]
    only_new = sorted(set(nq) - set(oq))
    if worse:
        print(f"\nregressions (> {thr:.0%}):")
        for k, a, b in sorted(worse, key=lambda t: t[2] / t[1], reverse=True):
            print(f"  {k:40s} {a:7.3f} -> {b:7.3f}  x{b / a:.2f}")
    if better:
        print(f"\nimprovements (> {thr:.0%}):")
        for k, a, b in sorted(better, key=lambda t: t[2] / t[1]):
            print(f"  {k:40s} {a:7.3f} -> {b:7.3f}  x{b / a:.2f}")
    if only_new:
        print("\nnew queries: " + ", ".join(f"{k} ({nq[k]:.2f}s)" for k in only_new))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
