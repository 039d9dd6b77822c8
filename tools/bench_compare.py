"""Diff two bench result files and flag per-query regressions.

Accepts either bench.py's raw JSON line or the driver's BENCH_r{N}.json
wrapper (whose ``tail`` embeds the JSON line). Prints shared-set totals,
the per-query deltas beyond a threshold, and the load-average context if
present (a shared host can move every number 2-6x — see BENCH loadavg_1m).

Day-effect normalization (VERDICT r10 #1): two clean runs of IDENTICAL
code measure 5-10% apart whole-run (host/JVM day drift — r11 measured
the same commit at 79.3 s and 90.2 s on different days, both at
ext_cores_max < 0.4), and individual iterative-BSP queries drift up to
25% run-to-run. Raw per-query ratios therefore mix three signals: code,
day, and per-query noise. This tool separates them: the MEDIAN ratio
across shared queries estimates the day effect (a code change rarely
moves the median of ~57 mostly-untouched queries), each query's ratio is
judged RELATIVE to that median, and deltas under an absolute floor
(--floor, default 0.3 s) are ignored as scheduling noise. Queries still
flagged after normalization are candidates for the N=5 protocol
(tools/bench_remeasure.py), which brackets the query's own clean-run
band before any regression verdict.

LIMIT of the normalization (ADVICE r11): subtracting the median ratio
makes a GENUINE UNIFORM code regression (a session/config change slowing
most queries alike) indistinguishable from host drift — only outliers
relative to the median are flagged. So when the day-effect estimate
itself exceeds ±15%, the tool prints an explicit warning and exits 3:
the whole-run shift needs an N=5 re-measure of the OLD commit
(tools/bench_remeasure.py) before it may be attributed to host drift.

Usage: python tools/bench_compare.py OLD NEW [--threshold 0.2] [--floor 0.3]
       (both --opt VALUE and --opt=VALUE forms accepted — argparse)
"""

from __future__ import annotations

import argparse
import json
import re
import sys

# |median ratio - 1| beyond this is a whole-run shift the normalization
# cannot classify by itself (drift vs uniform regression) — warn + exit 3
DAY_DRIFT_WARN = 0.15


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
    import statistics

    ap = argparse.ArgumentParser(
        description="Diff two bench result files; flag per-query "
        "regressions relative to the run pair's day effect."
    )
    ap.add_argument("old", help="bench JSON line / BENCH_DETAIL / driver wrapper")
    ap.add_argument("new", help="same formats as OLD")
    ap.add_argument("--threshold", type=float, default=0.2,
                    help="relative delta beyond day effect to flag (default 0.2)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="absolute seconds below which deltas are noise (default 0.3)")
    ns = ap.parse_args(sys.argv[1:])
    thr, floor = ns.threshold, ns.floor
    old, new = load(ns.old), load(ns.new)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    ot, nt = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    print(f"shared {len(shared)} queries: {ot:.2f}s -> {nt:.2f}s "
          f"({nt / ot:.2f}x)" if ot else "no shared queries")
    # day effect = median per-query ratio across the shared set, estimated
    # over queries >= 0.75 s only: driver BENCH records round to 1 decimal,
    # so a 0.3 s query's ratio quantizes to 1.00/1.33/0.67 — the sub-second
    # majority would pin the median to exactly 1.0 and hide a uniform
    # 5-10% drift that the mid-sized queries show plainly
    sizable = [k for k in shared if oq[k] >= 0.75]
    day = (
        statistics.median(nq[k] / oq[k] for k in sizable)
        if sizable else 1.0
    )
    print(f"day-effect estimate (median ratio over {len(sizable)} shared "
          f"queries >= 0.75s): {day:.2f}x — per-query deltas are judged "
          f"relative to this")
    big_shift = abs(day - 1.0) > DAY_DRIFT_WARN
    if big_shift:
        print(f"WARNING: the whole-run shift itself is {day:.2f}x — beyond "
              f"±{DAY_DRIFT_WARN:.0%}, the median-ratio normalization cannot "
              "distinguish host drift from a UNIFORM code regression (e.g. a "
              "session/config change slowing most queries alike). Re-measure "
              "the OLD commit with tools/bench_remeasure.py --n=5 before "
              "attributing this shift to the host. (exit 3)")
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
    # normalized per-query verdicts: ratio relative to the day effect,
    # with an absolute floor (sub-floor deltas are scheduling noise on
    # short queries no matter the ratio)
    worse = [
        (k, oq[k], nq[k]) for k in shared
        if nq[k] > oq[k] * day * (1 + thr) and nq[k] - oq[k] * day > floor
    ]
    better = [
        (k, oq[k], nq[k]) for k in shared
        if nq[k] < oq[k] * day * (1 - thr) and oq[k] * day - nq[k] > floor
    ]
    only_new = sorted(set(nq) - set(oq))
    if worse:
        print(f"\nregressions (> {thr:.0%} beyond day effect, > {floor}s):")
        for k, a, b in sorted(worse, key=lambda t: t[2] / t[1], reverse=True):
            print(f"  {k:40s} {a:7.3f} -> {b:7.3f}  x{b / a:.2f} "
                  f"(x{b / (a * day):.2f} day-adjusted)")
        print("  ^ before calling these code regressions, band them with "
              "tools/bench_remeasure.py --n=5")
    if better:
        print(f"\nimprovements (> {thr:.0%} beyond day effect, > {floor}s):")
        for k, a, b in sorted(better, key=lambda t: t[2] / t[1]):
            print(f"  {k:40s} {a:7.3f} -> {b:7.3f}  x{b / a:.2f} "
                  f"(x{b / (a * day):.2f} day-adjusted)")
    if only_new:
        print("\nnew queries: " + ", ".join(f"{k} ({nq[k]:.2f}s)" for k in only_new))
    return 3 if big_shift else 0


if __name__ == "__main__":
    raise SystemExit(main())
