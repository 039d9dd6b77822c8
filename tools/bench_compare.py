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
        ext_max = d.get("ext_cores_max")
        note = ""
        # in-run external-CPU probe (authoritative when present): a window
        # that saw > 1.5 co-tenant cores even after the bench's retries is
        # a load artifact — refuse the comparison (VERDICT r5 #1: two
        # consecutive committed BENCH files were exactly this).
        if ext_max is not None and ext_max > 1.5:
            note = f"  <-- CONTAMINATED (in-run external cores {ext_max} > 1.5)"
            contaminated = True
        elif ext_max is None and start is not None and start >= 1.0:
            # legacy files without the in-run probe: start gate only
            note = "  <-- CONTAMINATED (start load >= 1; deltas unusable)"
            contaminated = True
        if start is not None or finish is not None or ext_max is not None:
            print(f"  {tag} loadavg start={start} finish={finish} "
                  f"ext_cores_max={ext_max}{note}")
    if contaminated:
        print("\nREFUSED: at least one run was measured under host "
              "contention; per-query deltas would be load artifacts, not "
              "code changes. Re-run the contaminated side on an idle host.")
        return 2
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
