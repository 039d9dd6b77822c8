"""Diff two bench result files and flag per-query regressions.

Accepts either bench.py's raw JSON line or the driver's BENCH_r{N}.json
wrapper (whose ``tail`` embeds the JSON line). Prints shared-set totals,
the per-query deltas beyond a threshold, and the load-average context if
present (a shared host can move every number 2-6x — see BENCH loadavg_1m).

Day-effect normalization, SENTINEL form (VERDICT r12 #1): two clean runs
of IDENTICAL code measure 5-10% apart whole-run (host/JVM day drift — r11
measured the same commit at 79.3 s and 90.2 s on different days), so raw
per-query ratios mix three signals: code, day, and per-query noise. The
r10 estimator (median ratio over ALL shared queries) could not tell host
drift from a GENUINE UNIFORM code regression — a session/config change
slowing most queries alike moves the median itself, and r12's 1.13x
whole-run shift sat just under the ±15% trip wire, silently normalized.

The structural fix: derive the day effect ONLY from *sentinel* queries —
shared queries whose implementing files have ZERO git diff between the
two bench commits. Unchanged code cannot carry a code regression, so any
whole-run shift the sentinels show IS the host, by construction; and a
uniform regression in the round's changed files now shows up as the
changed-file query set moving *against* the sentinel band instead of
dragging the estimate. Query → implementing-files comes from the plan
registry (each builder's module) plus the static import closure of that
module within the package; the two commits come from ``git log`` on the
bench files themselves (overridable with --old-commit/--new-commit).

Fallback: when git/registry mapping is unavailable (files outside the
repo, --no-git) or the sentinel set is too small (< --min-sentinels
sizable queries), the tool reverts to the r10 all-shared-median estimator
and keeps its honesty valve: a whole-run shift beyond ±15% warns and
exits 3, because THAT estimator cannot classify it.

Exit codes: 0 ok · 2 contaminated run refused · 3 fallback estimator with
unclassifiable whole-run shift · 4 sentinel estimator detected a uniform
shift in changed-file queries beyond the sentinel band.

Usage: python tools/bench_compare.py OLD NEW [--threshold 0.2] [--floor 0.3]
       (both --opt VALUE and --opt=VALUE forms accepted — argparse)
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re
import statistics
import subprocess
import sys

# |median ratio - 1| beyond this is a whole-run shift the FALLBACK
# normalization cannot classify by itself (drift vs uniform regression) —
# warn + exit 3. Sentinel mode needs no such valve: its estimate is
# host-attributable by construction.
DAY_DRIFT_WARN = 0.15

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = "etl_expenses_spark"
# Plumbing shared by EVERY query: harness, session config, registry
# scaffolding, table loading, cache tracking, package __init__ re-exports.
# A diff here cannot be attributed per-query by ANY estimator (it taints
# all closures equally), so these files are excluded from per-query
# closures — a change to one is surfaced as an explicit caveat on the
# sentinel verdict instead of silently emptying the sentinel set.
_GLOBAL_FILES = frozenset({
    "bench.py",
    f"{_PKG}/session.py",
    f"{_PKG}/caching.py",
    f"{_PKG}/plans/registry.py",
    f"{_PKG}/plans/_util.py",
    f"{_PKG}/sources/readers.py",
})


def _is_global(relpath: str) -> bool:
    return relpath in _GLOBAL_FILES or relpath.endswith("__init__.py")


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


# ---------------------------------------------------------------- sentinel
# query -> implementing-files mapping (static import closure)

def _module_file(modname: str) -> str | None:
    """Repo-relative file for a package module name, if it exists."""
    rel = modname.replace(".", "/")
    for cand in (rel + ".py", os.path.join(rel, "__init__.py")):
        if os.path.exists(os.path.join(_REPO, cand)):
            return cand
    return None


def _imported_pkg_modules(relpath: str, modname: str) -> set[str]:
    """Package modules imported ANYWHERE in a file (module level or inside
    any function body — plan builders import their operators locally).
    Coarse on purpose: it taints every query in a plan module with every
    import that module makes, which errs toward FEWER sentinels, never
    toward a false one."""
    try:
        tree = ast.parse(open(os.path.join(_REPO, relpath)).read())
    except (OSError, SyntaxError):
        return set()
    found: set[str] = set()
    pkg_parts = modname.split(".")[:-1] if not relpath.endswith("__init__.py") \
        else modname.split(".")
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.split(".")[0] == _PKG:
                    found.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against this module's package
                base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if mod.split(".")[0] != _PKG:
                continue
            found.add(mod)
            # `from pkg.operators import apss` names a MODULE, not an attr
            for alias in node.names:
                if _module_file(f"{mod}.{alias.name}"):
                    found.add(f"{mod}.{alias.name}")
    return found


def _closure(modname: str, memo: dict[str, set[str]]) -> set[str]:
    """Transitive set of repo-relative package files `modname` depends on."""
    if modname in memo:
        return memo[modname]
    memo[modname] = set()  # cycle guard; filled below
    f = _module_file(modname)
    if f is None:
        return memo[modname]
    acc = {f}
    for dep in _imported_pkg_modules(f, modname):
        acc |= _closure(dep, memo)
    memo[modname] = acc
    return acc


def query_files(names) -> dict[str, set[str]]:
    """Map each query name to the repo-relative files implementing it:
    the plan module that registers it plus that module's static import
    closure within the package. Raises ImportError if the registry can't
    load (caller falls back to the legacy estimator)."""
    sys.path.insert(0, _REPO)
    from etl_expenses_spark.plans import REGISTRY  # imports pyspark, no JVM

    memo: dict[str, set[str]] = {}
    out: dict[str, set[str]] = {}
    for n in names:
        q = REGISTRY.get(n)
        if q is None:
            continue
        fn = getattr(q.build, "__wrapped__", q.build)
        out[n] = {f for f in _closure(fn.__module__, memo) if not _is_global(f)}
    return out


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", _REPO, *args], capture_output=True, text=True, check=True
    ).stdout.strip()


def bench_commit(path: str) -> str | None:
    """Commit that last touched a committed bench file (None if untracked
    or outside the repo — e.g. test fixtures in /tmp)."""
    try:
        rel = os.path.relpath(os.path.abspath(path), _REPO)
        if rel.startswith(".."):
            return None
        out = _git("log", "-n", "1", "--format=%H", "--", rel)
        return out or None
    except (subprocess.CalledProcessError, OSError):
        return None


def changed_between(old_commit: str, new_commit: str) -> set[str]:
    return {
        ln for ln in _git(
            "diff", "--name-only", old_commit, new_commit,
            "--", _PKG, "bench.py",
        ).splitlines() if ln
    }


def analyze(oq: dict, nq: dict, qfiles: dict[str, set[str]] | None,
            changed: set[str] | None, thr: float, floor: float,
            min_sentinels: int = 5) -> dict:
    """Pure comparison core (unit-testable without git or the registry).

    Returns a dict with: shared, sizable, mode ('sentinel'|'fallback'),
    sentinels, day, changed_queries, changed_median (ratio vs day, None if
    too few), worse, better, only_new, uniform_regression (bool),
    big_shift (fallback-mode unclassifiable drift).
    """
    shared = sorted(set(oq) & set(nq))
    # day effect estimated over queries >= 0.75 s only: driver BENCH
    # records round to 1 decimal, so a 0.3 s query's ratio quantizes to
    # 1.00/1.33/0.67 — the sub-second majority would pin the median to
    # exactly 1.0 and hide a uniform 5-10% drift
    sizable = [k for k in shared if oq[k] >= 0.75]
    sentinels: list[str] = []
    changed_q: list[str] = []
    if qfiles is not None and changed is not None:
        for k in sizable:
            files = qfiles.get(k)
            if files and not (files & changed):
                sentinels.append(k)
            else:
                changed_q.append(k)
    mode = (
        "sentinel"
        if qfiles is not None and len(sentinels) >= min_sentinels
        else "fallback"
    )
    basis = sentinels if mode == "sentinel" else sizable
    day = statistics.median(nq[k] / oq[k] for k in basis) if basis else 1.0
    # uniform-shift check on the changed-file set: its own median ratio,
    # judged against the sentinel day effect
    changed_sizable = [k for k in changed_q if oq[k] >= 0.75]
    changed_median = (
        statistics.median(nq[k] / oq[k] for k in changed_sizable)
        if len(changed_sizable) >= 3 else None
    )
    uniform_regression = (
        mode == "sentinel"
        and changed_median is not None
        and changed_median > day * (1 + thr)
    )
    worse = [
        (k, oq[k], nq[k]) for k in shared
        if nq[k] > oq[k] * day * (1 + thr) and nq[k] - oq[k] * day > floor
    ]
    better = [
        (k, oq[k], nq[k]) for k in shared
        if nq[k] < oq[k] * day * (1 - thr) and oq[k] * day - nq[k] > floor
    ]
    return {
        "shared": shared, "sizable": sizable, "mode": mode,
        "sentinels": sentinels, "changed_queries": changed_q, "day": day,
        "changed_median": changed_median,
        "uniform_regression": uniform_regression,
        "worse": worse, "better": better,
        "only_new": sorted(set(nq) - set(oq)),
        "big_shift": mode == "fallback" and abs(day - 1.0) > DAY_DRIFT_WARN,
    }


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Diff two bench result files; flag per-query "
        "regressions relative to the run pair's day effect (estimated "
        "from unchanged-code sentinel queries when git history allows)."
    )
    ap.add_argument("old", help="bench JSON line / BENCH_DETAIL / driver wrapper")
    ap.add_argument("new", help="same formats as OLD")
    ap.add_argument("--threshold", type=float, default=0.2,
                    help="relative delta beyond day effect to flag (default 0.2)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="absolute seconds below which deltas are noise (default 0.3)")
    ap.add_argument("--old-commit", default=None,
                    help="commit OLD was measured at (default: git log on OLD)")
    ap.add_argument("--new-commit", default=None,
                    help="commit NEW was measured at (default: git log on NEW)")
    ap.add_argument("--no-git", action="store_true",
                    help="skip sentinel mapping; legacy all-shared-median estimator")
    ap.add_argument("--min-sentinels", type=int, default=5,
                    help="fewest sizable unchanged-code queries to trust the "
                    "sentinel estimate (default 5)")
    ns = ap.parse_args(sys.argv[1:])
    thr, floor = ns.threshold, ns.floor
    old, new = load(ns.old), load(ns.new)
    oq, nq = old["queries"], new["queries"]

    qfiles = changed = None
    global_changed: list[str] = []
    if not ns.no_git:
        oc = ns.old_commit or bench_commit(ns.old)
        nc = ns.new_commit or bench_commit(ns.new)
        if oc and nc and oc != nc:
            try:
                changed = changed_between(oc, nc)
                qfiles = query_files(set(oq) & set(nq))
                global_changed = sorted(f for f in changed if _is_global(f))
            except Exception as e:  # registry/git unavailable — fall back
                print(f"sentinel mapping unavailable ({e.__class__.__name__}: "
                      f"{e}); falling back to all-shared-median estimator")
                qfiles = changed = None
        else:
            print("bench commits not resolvable from git (untracked files or "
                  "identical commits); falling back to all-shared-median "
                  "estimator. Pass --old-commit/--new-commit to enable "
                  "sentinel mode.")

    r = analyze(oq, nq, qfiles, changed, thr, floor, ns.min_sentinels)
    shared, day = r["shared"], r["day"]
    ot, nt = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    print(f"shared {len(shared)} queries: {ot:.2f}s -> {nt:.2f}s "
          f"({nt / ot:.2f}x)" if ot else "no shared queries")

    if r["mode"] == "sentinel":
        print(f"day-effect estimate (median ratio over {len(r['sentinels'])} "
              f"SENTINEL queries >= 0.75s whose implementing files have zero "
              f"diff between the bench commits): {day:.2f}x — host-"
              f"attributable by construction; per-query deltas are judged "
              f"relative to this")
        if global_changed:
            print(f"  caveat: shared-infrastructure files changed between the "
                  f"commits ({', '.join(global_changed)}) — sentinel verdicts "
                  f"assume those changes are performance-neutral; adjudicate "
                  f"them by eye")
        if r["changed_median"] is not None:
            cm = r["changed_median"]
            print(f"  changed-file set ({len(r['changed_queries'])} queries): "
                  f"median ratio {cm:.2f}x vs sentinel {day:.2f}x "
                  f"({cm / day:.2f}x day-adjusted)")
        if r["uniform_regression"]:
            print(f"UNIFORM REGRESSION SUSPECTED: the changed-file queries "
                  f"moved {r['changed_median'] / day:.2f}x beyond the "
                  f"unchanged-code sentinel band — this is the shift the "
                  f"legacy median estimator would have absorbed as drift. "
                  f"Band the changed queries with tools/bench_remeasure.py "
                  f"--n=5 before shipping. (exit 4)")
    else:
        if qfiles is not None and changed is not None:
            print(f"only {len(r['sentinels'])} sentinel queries "
                  f"(<{ns.min_sentinels}); estimate is fallback-grade")
        print(f"day-effect estimate (median ratio over {len(r['sizable'])} shared "
              f"queries >= 0.75s): {day:.2f}x — per-query deltas are judged "
              f"relative to this")
    if r["big_shift"]:
        print(f"WARNING: the whole-run shift itself is {day:.2f}x — beyond "
              f"±{DAY_DRIFT_WARN:.0%}, the all-shared median normalization "
              "cannot distinguish host drift from a UNIFORM code regression "
              "(e.g. a session/config change slowing most queries alike). "
              "Re-measure the OLD commit with tools/bench_remeasure.py --n=5 "
              "before attributing this shift to the host. (exit 3)")

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

    if r["worse"]:
        print(f"\nregressions (> {thr:.0%} beyond day effect, > {floor}s):")
        for k, a, b in sorted(r["worse"], key=lambda t: t[2] / t[1], reverse=True):
            mark = " [changed files]" if k in r["changed_queries"] else (
                " [unchanged code — noise candidate]"
                if r["mode"] == "sentinel" else "")
            print(f"  {k:40s} {a:7.3f} -> {b:7.3f}  x{b / a:.2f} "
                  f"(x{b / (a * day):.2f} day-adjusted){mark}")
        print("  ^ before calling these code regressions, band them with "
              "tools/bench_remeasure.py --n=5")
    if r["better"]:
        print(f"\nimprovements (> {thr:.0%} beyond day effect, > {floor}s):")
        for k, a, b in sorted(r["better"], key=lambda t: t[2] / t[1]):
            print(f"  {k:40s} {a:7.3f} -> {b:7.3f}  x{b / a:.2f} "
                  f"(x{b / (a * day):.2f} day-adjusted)")
    if r["only_new"]:
        print("\nnew queries: " + ", ".join(
            f"{k} ({nq[k]:.2f}s)" for k in r["only_new"]))
    if r["uniform_regression"]:
        return 4
    return 3 if r["big_shift"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
