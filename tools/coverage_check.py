"""Docs-vs-code consistency gate: COVERAGE.md and the query registry must
reference each other completely.

- every query registered in etl_expenses_spark.plans must be NAMED in
  COVERAGE.md (an operator without a coverage row is invisible to review);
- every backtick-quoted snake_case name in COVERAGE.md that LOOKS like a
  query (matches a registry naming pattern) must actually exist (stale doc
  rows rot silently otherwise);
- every `/root/reference/<path>` cited anywhere in the package must
  resolve to a real file (VERDICT r6 #5 found two fabricated citations —
  provenance claims must stay file:line-verifiable).

    python tools/coverage_check.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from etl_expenses_spark.plans import REGISTRY  # noqa: E402


def broken_reference_citations() -> list[str]:
    """Every /root/reference/... path cited in repo source must exist."""
    bad = []
    for dirpath, _dirs, files in os.walk("/root/repo/etl_expenses_spark"):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            for m in re.finditer(
                r"/root/reference/[A-Za-z0-9_./-]+", open(p).read()
            ):
                cited = m.group(0).rstrip(".").split(":")[0]
                if not os.path.exists(cited):
                    bad.append(f"{p}: cites nonexistent {cited}")
    return sorted(set(bad))


def main() -> int:
    text = open("/root/repo/COVERAGE.md").read()
    mentioned = set(re.findall(r"`([a-z0-9_]+)`", text))

    unlisted = sorted(q for q in REGISTRY if q not in mentioned)
    problems = []
    if unlisted:
        problems.append(f"{len(unlisted)} registered queries missing from COVERAGE.md: {unlisted}")

    # names that look like queries (share a prefix with real query families)
    # but aren't registered — likely renamed/stale
    prefixes = {q.split("_")[0] for q in REGISTRY}
    suspicious = sorted(
        n
        for n in mentioned
        if n not in REGISTRY
        and "_" in n
        and n.split("_")[0] in prefixes
        and not n.endswith((".py", ".md"))
        # helper/API names legitimately documented alongside queries:
        and n
        not in {
            "merge_append",
            "dedup_events_ttl",
            "window_agg",
            "test_stream_merge_exactly_once",
            "test_stream_windowed_counts_match_batch",
            "test_stateful_running_totals_across_restarts",
            "test_stream_interval_join_matches_batch",
            "sql_surface",
            # operator/streaming function names documented alongside their
            # query rows (all verified to exist in the package):
            "colocated_join",
            "compaction_plan",
            "zorder_layout",
            "merge_append_evolve",
            "hll_read_daily_users",
            "semantic_neardup_pairs_multiprobe",
            # streaming operator function names (streaming/pipeline.py),
            # documented alongside the stream_full_outer_interval_join row:
            "stream_dedup_within_watermark",
            "stream_sessionized_values",
            "stream_windowed_counts",
            # Spark SQL builtin names cited in the bitmap rollup row:
            "bitmap_construct_agg",
            "bitmap_or_agg",
            "bitmap_count",
            "approx_top_k",
            # operator/function names documented alongside r11/r12 rows
            # (verified to exist in the package):
            "dedup_events_ttl_tws",
            "embedding_neardup_pairs_lsh_multiprobe",
            "hilbert_key_numpy",
            "allpairs_jaccard_prefix_delta",
        }
    )
    if suspicious:
        problems.append(f"possibly-stale names in COVERAGE.md: {suspicious}")

    broken = broken_reference_citations()
    if broken:
        problems.append("fabricated reference citations:\n  " + "\n  ".join(broken))

    # committed claims must match the code (VERDICT r8 #5): the LAST
    # "Registered queries: N" line in COVERAGE.md is the current-state
    # claim and must equal the live registry size
    counts = re.findall(r"Registered queries: (\d+)", text)
    if not counts:
        problems.append("COVERAGE.md is missing its 'Registered queries: N' current-state line")
    elif int(counts[-1]) != len(REGISTRY):
        problems.append(
            f"COVERAGE.md claims {counts[-1]} registered queries; the registry has {len(REGISTRY)}"
        )

    # cross-document count agreement (VERDICT r11 #8: the r11 closing
    # records briefly disagreed 324 vs 325 between commits) — the registry
    # size stated in README.md and the QUERIES.md header must equal the
    # live registry, and QUERIES.md's oracle count must equal the live
    # oracle count. One source of truth: the code.
    n = len(REGISTRY)
    n_oracled = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    readme = open("/root/repo/README.md").read()
    m = re.search(r"full inventory \((\d+) queries", readme)
    if not m:
        problems.append("README.md is missing its 'full inventory (N queries' claim")
    elif int(m.group(1)) != n:
        problems.append(
            f"README.md claims {m.group(1)} queries; the registry has {n}"
        )
    qidx = open("/root/repo/QUERIES.md").read()
    mq = re.search(r"gen_query_index\.py`\. (\d+) queries,\s*\n?(\d+) with a DuckDB oracle", qidx)
    if not mq:
        problems.append("QUERIES.md header counts not found (regenerate with tools/gen_query_index.py)")
    elif (int(mq.group(1)), int(mq.group(2))) != (n, n_oracled):
        problems.append(
            f"QUERIES.md header claims {mq.group(1)}/{mq.group(2)} queries/oracled; "
            f"registry has {n}/{n_oracled} (regenerate with tools/gen_query_index.py)"
        )

    # closing-record single-sourcing (VERDICT r12 #7: the r12 closing
    # records said both "327/327" and "328/328" across two commits as
    # operators landed mid-round): in the LATEST closing-record section of
    # COVERAGE.md, every registry-sweep claim — a "N/N" pair with equal
    # sides at N >= 100 (the driver window's "50/50" and pytest's
    # "447 passed / 0 failed" shapes don't match) — and every
    # "Registry **N queries" claim must equal the live registry size.
    closings = list(re.finditer(r"#+ Round-\d+ closing record", text))
    # a closing record followed by a newer "Registered queries: N" line has
    # been superseded by in-round updates — it is a historical snapshot and
    # the superseding line already carries the live-count assertion
    last_count = max(m.start() for m in re.finditer(r"Registered queries: \d+", text)) \
        if counts else -1
    if closings and closings[-1].start() > last_count:
        tail = text[closings[-1].start():]
        nxt = re.search(r"\n#+ ", tail[1:])
        section = tail[: nxt.start() + 1] if nxt else tail
        for a, b in re.findall(r"\b(\d{3,})/(\d{3,})\b", section):
            if a == b and int(a) != n:
                problems.append(
                    f"latest closing record claims a {a}/{b} sweep; the "
                    f"registry has {n} queries — restate the count once, "
                    "from the code"
                )
        for m2 in re.finditer(r"Registry \*\*(\d+) queries", section):
            if int(m2.group(1)) != n:
                problems.append(
                    f"latest closing record says 'Registry **{m2.group(1)} "
                    f"queries'; the registry has {n}"
                )

    if problems:
        print("\n".join(problems))
        return 1
    print(f"COVERAGE.md consistent: all {len(REGISTRY)} queries listed, no stale names")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
