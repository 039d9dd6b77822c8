"""Benchmark harness — the driver runs this per round and records BENCH_r{N}.json.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
The full per-query record (4-decimal timings + per-query ext_cores +
retries) is written to BENCH_DETAIL.json next to this file — that file is
what tools/bench_compare.py should be pointed at for cross-round deltas.

Methodology: all tables are warmed once (footer + page cache), then each
query executes to the noop sink (full computation, no driver-side row
serialization) three times; the per-query time is the MEDIAN of three —
one untimed structural warm-up would hide codegen compilation entirely,
while best-of-N hides variance; median-of-3 reports a typical steady run
honestly. The first of the three still carries codegen for that query's
plan shape; the median discards it unless runs are genuinely noisy.

Contamination control (VERDICT r5 #1 — BENCH_r04 AND _r05 were recorded
under mid-run host contention and overstated every query): besides the
start-load gate, every query's 3-run window is bracketed by the
tools/cpuprobe external-CPU probe, which counts cores burned OUTSIDE our
process tree during the window (in-run loadavg cannot do this — the bench
itself drives load past 6). A query whose window saw more than
$SPARK_GRAFT_BENCH_MAX_EXT external cores (default 1.5) is re-measured up
to twice after a short backoff; the cleanest attempt wins. The JSON line
records per-query `ext_cores` and the overall `ext_cores_max` so
tools/bench_compare.py can refuse cross-round deltas from runs that stayed
contaminated.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_expenses_spark.plans import REGISTRY
from etl_expenses_spark.session import get_spark
from etl_expenses_spark.sources.readers import TESTDATA_TABLES, load_table

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
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_pairs",
    "similarity_cosine_topk",
    "similarity_cosine_topk_ivf",
    "asof_join_events_orders",
    "window_tumbling_daily",
    "text_token_stats",
    # the heaviest plans — iterative CC, bucketed range join, 8-table TPC-H,
    # corpus-wide span dedup — so regressions in the hard shapes are visible
    # round-over-round
    "dedup_cluster_components",
    "range_join_recent_clicks",
    "tpch_q8_market_share",
    "tpch_q21_waiting_supplier",
    "dedup_spans_keep_first",
    # round-2 additions: the two-phase global-rank scan and the blocked
    # fuzzy self-join — new plan shapes worth regression-tracking
    "equidepth_histogram_totals",
    "fuzzy_match_part_names",
    "cohort_retention_monthly",
    # round-3 additions: prefix-sum / behavior family representatives plus
    # the two rewritten scale shapes (3-level gap cascade, distributed
    # NTILE) so the perf gate covers every family with a plan worth
    # regression-tracking
    "rfm_segmentation",
    "prefix_sum_document_bytes",
    "growth_accounting_daily",
    "sequence_gap_detection",
    "curriculum_quality_bins",
    "basket_pair_lift",
    "pit_join_events_user_tier",
    # round-3 retrieval surface: corpus-wide ranked retrieval and the
    # iterative BSP centrality loop — the two new plan archetypes
    "bm25_topk_per_query",
    "pagerank_copurchase",
    "lm_bigram_rarity",
    # round-10 rotation (COVERAGE.md governance): the uncapped wedge scorer
    # link_prediction_jaccard rotated OUT (its capped tier below carries the
    # family's scale verdict; the uncapped form remains its oracle and is
    # tracked by tools/scaling_study.py) for the two-phase 3D skyline —
    # the partition-local SFS sweep + bounded broadcast merge archetype
    "skyline_orders_3d",
    # round-5 additions: the hot-node degree-capped wedge tier (the shape
    # you actually run at 100 TB) and the pure-Python JPEG decode through
    # Arrow-batched mapInPandas (the round's new Python-stage archetype)
    "link_prediction_jaccard_capped",
    "multimodal_jpeg_roundtrip",
    # round-5 additions (late): the header-only container census (per-row
    # cost independent of payload bytes — the probe archetype) and the
    # SemDeDup composition (cluster -> in-cell pairs -> CC, the corpus
    # curation archetype with the adaptive-k linear pair bound)
    "multimodal_container_census",
    "semantic_dedup_prune",
    # the end-to-end curation composition (quality -> exact -> near-dup ->
    # decontaminate): regression-tracks the chained plan, not a new shape
    "corpus_curation_funnel",
    # round-6 additions: the four new plan archetypes — exact-threshold
    # APSS (prefix-filtered inverted index), bloom semi-join reduction
    # (broadcast bit-array runtime filter), perceptual image dedup (codec
    # decode + pigeonhole-banded hamming join), and the h-index k-core BSP
    "allpairs_cosine_prefix_join",
    "bloom_semijoin_reduction",
    "image_dhash_neardup",
    # round-11 rotation (COVERAGE.md governance + VERDICT r10 #8): the
    # UNCAPPED k-core rotated OUT — its capped tier below carries the
    # h-index family's scale verdict (the shape you run at 100 TB); the
    # uncapped form keeps its computed oracle and SCALING.json tracking —
    # for the layered-skyband delete-maintenance fold (the IVM-under-
    # deletes archetype: resurrection from a thick view, r11)
    "skyline_delete_maintenance",
    # round-7 addition: the degree-capped k-core tier (mutual-capped
    # adjacency bounds per-node state and round count — the shape you run
    # on hub-heavy graphs; uncapped stays as its oracle, like linkpred)
    "kcore_copurchase_capped",
    # round-6 additions (late): local fingerprint self-join with MOSS's
    # common-fingerprint bucket cap, the two-pass Misra-Gries exact heavy
    # hitters (no key-space shuffle), and the pure-Python Avro container
    # codec through mapInPandas (the round's Python-stage archetype)
    "winnowing_shared_fingerprints",
    "heavy_hitters_two_pass",
    "avro_roundtrip_orders",
    # round-7 additions: exact mergeable-bitmap distinct rollup (the new
    # agg-state archetype) and the LEFT OUTER bucketed range join (outer
    # interval semantics — NULL restoration via left_anti)
    "bitmap_weekly_distinct_rollup",
    "range_left_join_unmatched_clicks",
    # round-8 additions: the grid-cell spatial equi-join (3×3 replicated
    # small side — the never-cross-join distance archetype) and delta-join
    # view maintenance (CDC z-set fold; the O(|Δ|) maintenance archetype)
    "geo_cell_join_nearby_pairs",
    "ivm_join_view_cdc",
    # round-8 additions (late): the spatial SELF-join (both sides the same
    # big relation), the exact sliding-gram duplicated-span detector (one
    # window-over-gram shuffle, the ExactSubstr archetype), and k-truss
    # support peeling (per-round triangle enumeration — the iterative
    # edge-state archetype)
    "geo_neardup_points_selfjoin",
    # round-10 rotation (COVERAGE.md governance): the string-keyed
    # ExactSubstr detector dedup_exact_duplicated_spans rotated OUT — its
    # hash-first tier below is the same output with the better shuffle
    # (the policy's "faster sibling replaces" case; the string-keyed form
    # stays oracle-pinned and scaling-tracked) — for the end-to-end exact
    # near-dup curation composition.
    # round-12 rotation: that composition (dedup_exact_jaccard_curation)
    # rotated OUT for its INCREMENTAL sibling — dedup_incremental_apss
    # runs the identical pair→CC→keep-best machinery in-plan (stored-state
    # derivation) PLUS the delta probe and star fold, so it regression-
    # tracks a superset of the same plan at the operational 100 TB shape
    # (recurate a delta, never the corpus). The full-recompute form keeps
    # its computed oracle and SCALING.json rows; the delta-proportionality
    # study lives in SCALING.md.
    "dedup_incremental_apss",
    # round-9 addition: the ExactSubstr hash-first corpus-scale tier
    # (8-byte xxhash64 shuffle keys + raw-gram verify of multi-hash buckets
    # only — identical output, shuffle payload no longer scales with L)
    "dedup_exact_duplicated_spans_hashed",
    # round-9 addition: the distributed capped suffix array (range-sort of
    # candidate suffix windows + lexicographic-neighbor LCP — the
    # variable-length maximal-repeat archetype; spans output pinned
    # identical to the gram-union form)
    "dedup_spans_suffix_array",
    # NOT added despite being new archetypes: ivm_lsh_index_cdc and
    # quantile_sketch_weekly_rollup would push the compact stdout line past
    # the driver's 1900-byte capture even at the 1-decimal degradation
    # stage (61 names no longer fit; the pointer fallback would strip the
    # per-query map from the driver record). They are regression-tracked
    # by tools/scaling_study.py instead (SCALING.json rows at all tiers).
    # round-11 rotation (COVERAGE.md governance + VERDICT r10 #8): the
    # UNCAPPED k-truss rotated OUT — the capped tier below carries the
    # support-peeling family's scale verdict; the uncapped form keeps its
    # computed oracle and SCALING.json tracking — for the 2-bit multiprobe
    # LSH recall tier (the tuned candidate-generation archetype whose
    # oracle is a brute-force recall proof, r11)
    "dedup_embedding_lsh_tuned",
    # the support-peeling family's hub-capped scale tier (mutual-capped
    # adjacency, lower-bound contract — the shape you run on hub-heavy
    # graphs)
    "ktruss_copurchase_capped",
]


def run_once(q, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


VARIANCE_SPREAD = 2.0  # max/min run ratio that marks a 3-run window bimodal
VARIANCE_EXTRA_RUNS = 2  # extra samples taken when the guard trips


def measure_query(q, spark, sf_dir: str, max_ext: float,
                  attempts: int = 3) -> tuple[float, float, int, list[float]]:
    """Median-of-3 timing with contention-aware retry and a variance guard.

    Returns (median_sec, ext_cores, retries, discarded_outlier_runs). Each
    attempt brackets its 3-run window with the external-CPU probe; if
    co-tenant processes burned more than `max_ext` cores on average during
    the window, the timing is a load artifact — back off briefly and
    re-measure. The FASTEST clean attempt wins (a clean window's median is
    a valid measurement, and the fastest of several is the least
    residually-disturbed one — VERDICT r6 #3); if no attempt came in clean,
    the one with the lowest external load is the least contaminated
    estimate we managed to take.

    Variance guard (VERDICT r8 #1: allpairs_cosine_prefix_join is bimodal
    at ~10 s / ~24.5 s on identical code and data, and the committed record
    was hostage to which mode median-of-3 happened to sample): when the
    3-run spread exceeds VARIANCE_SPREAD×, take VARIANCE_EXTRA_RUNS more
    runs and report the median of the TIGHT CLUSTER (runs within the spread
    of the fastest — the mode that reflects the plan, not the lottery);
    discarded slow-mode runs are returned and land in BENCH_DETAIL.json's
    `variance_outliers` so the record shows what was excluded."""
    import statistics

    from tools.cpuprobe import ContentionWindow

    best = None  # (ext_cores, median, discarded), never clean
    best_clean = None  # (median, ext, discarded), clean
    for attempt in range(attempts):
        win = ContentionWindow()
        t0 = time.perf_counter()
        runs = sorted(run_once(q, spark, sf_dir) for _ in range(3))
        discarded: list[float] = []
        if runs[0] > 0 and runs[-1] / runs[0] > VARIANCE_SPREAD:
            runs = sorted(runs + [run_once(q, spark, sf_dir)
                                  for _ in range(VARIANCE_EXTRA_RUNS)])
            cluster = [r for r in runs if r <= runs[0] * VARIANCE_SPREAD]
            discarded = [r for r in runs if r > runs[0] * VARIANCE_SPREAD]
            med_run = float(statistics.median(cluster))
        else:
            med_run = runs[1]
        ext = win.external_cores(time.perf_counter() - t0)
        if ext <= max_ext and (best_clean is None or med_run < best_clean[0]):
            best_clean = (med_run, ext, discarded)
        if best is None or ext < best[0]:
            best = (ext, med_run, discarded)
        if ext <= max_ext:
            break
        if attempt + 1 < attempts:
            print(
                f"bench: {q.name if hasattr(q, 'name') else '?'} window saw "
                f"{ext:.2f} external cores (> {max_ext}); re-measuring "
                f"(retry {attempt + 1}/{attempts - 1})",
                file=sys.stderr,
            )
            time.sleep(5.0)
    if best_clean is not None:
        med, ext, discarded = best_clean
    else:
        ext, med, discarded = best
    return med, ext, attempt, discarded


def wait_for_idle_host(max_load: float = 1.0, max_wait_sec: float = 300.0) -> float:
    """Gate the measurement on host load.

    BENCH_r04 was recorded at loadavg 5.06 and reported 41.29 s where an
    idle re-run of identical code measured 32.79 s (VERDICT.md round 4,
    "What's wrong" #2) — contention manufactures phantom regressions. Poll
    the 1-min load average BEFORE warm-up and wait (bounded) until it drops
    below `max_load`; if it never does, proceed anyway but the recorded
    `loadavg_start` flags the run as contaminated for bench_compare.
    """
    deadline = time.monotonic() + max_wait_sec
    load = os.getloadavg()[0]
    while load >= max_load and time.monotonic() < deadline:
        print(
            f"bench: host load {load:.2f} >= {max_load}; waiting for idle "
            f"(up to {int(deadline - time.monotonic())}s left)",
            file=sys.stderr,
        )
        time.sleep(10.0)
        load = os.getloadavg()[0]
    if load >= max_load:
        print(
            f"bench: WARNING proceeding at load {load:.2f} after "
            f"{int(max_wait_sec)}s wait; timings may be contaminated",
            file=sys.stderr,
        )
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = wait_for_idle_host(
        max_load=float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "1.0")),
        max_wait_sec=float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "300")),
    )
    spark = get_spark("bench")

    for t in TESTDATA_TABLES:  # warm footers + page cache + first codegen
        load_table(spark, sf_dir, t).count()

    # Session warm-up: the first real job in a fresh JVM additionally pays
    # executor-pool spin-up, whole-stage-codegen compiler init, and the
    # broadcast machinery's first exchange — costs that otherwise land on
    # whichever query happens to run first and pollute round-over-round
    # deltas (r2→r3 showed the slot-1 query swinging ±35% on identical
    # code). One untimed run of the first headline query absorbs them.
    run_once(REGISTRY[HEADLINE[0]], spark, sf_dir)

    # Python-worker warm-up (r14, VERDICT r13 #3): the FIRST pandas-UDF /
    # applyInPandas stage of a session additionally pays Python worker
    # daemon spin-up and pandas/pyarrow import on every core — measured
    # 6-12 s once per session, landing on whichever Arrow-stage query runs
    # first (allpairs_cosine_prefix_join's recorded bimodality, VERDICT r8
    # #1). One trivial applyInPandas over a 32-part 1-row-per-part frame
    # in the UNTIMED warm phase absorbs it — session warm-up, not result
    # caching: nothing derived from the benched queries or data persists.
    (
        spark.range(0, 32, 1, 32)
        .groupBy("id")
        .applyInPandas(lambda pdf: pdf, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    max_ext = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXT", "1.5"))
    timings: dict[str, float] = {}
    ext_cores: dict[str, float] = {}
    retried: dict[str, int] = {}
    variance_outliers: dict[str, list[float]] = {}
    for name in HEADLINE:
        med, ext, retries, discarded = measure_query(
            REGISTRY[name], spark, sf_dir, max_ext
        )
        timings[name] = round(med, 4)
        ext_cores[name] = round(ext, 2)
        if retries:
            retried[name] = retries
        if discarded:
            variance_outliers[name] = [round(r, 4) for r in discarded]
            print(
                f"bench: {name} 3-run spread exceeded {VARIANCE_SPREAD}x; "
                f"extended to {3 + VARIANCE_EXTRA_RUNS} runs, reported the "
                f"tight-cluster median and discarded {variance_outliers[name]}",
                file=sys.stderr,
            )

    # Two outputs (VERDICT r6 #2 — the r6 line grew past the driver's
    # 2000-char stdout-tail capture once per-query ext_cores joined it, and
    # the committed perf record was an unparseable fragment):
    #   1. BENCH_DETAIL.json, committed to the repo: the FULL record —
    #      per-query timings, per-query ext_cores, retries, contention
    #      markers. tools/bench_compare.py reads this file directly.
    #   2. ONE compact stdout line (the driver's contract): metric, value,
    #      the per-query timing map (3 decimals, compact separators — the
    #      driver grades the 48-query map, so it stays), sf, and the
    #      summary contention markers only. ~1.7 KB at 48 queries; the
    #      length guard below drops to 2 decimals before ever exceeding
    #      the capture window.
    line, detail = format_outputs(
        timings, ext_cores, retried, sf, load_start, os.getloadavg()[0],
        variance_outliers=variance_outliers,
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    sys.stdout.flush()
    print(line, flush=True)


def format_outputs(timings, ext_cores, retried, sf, load_start, load_now,
                   variance_outliers=None):
    """(compact stdout line, full detail dict) for a finished run."""
    total = round(sum(timings.values()), 4)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if str(sf).replace(".", "").isdigit() else sf,
        # `loadavg_start` is captured BEFORE warm-up (post idle-gate);
        # loadavg_1m at finish mostly measures the bench itself. The
        # authoritative in-run signal is per-query `ext_cores` and
        # `ext_cores_max`: average USER-space cores burned by processes
        # outside our tree during each query's window (tools/cpuprobe.py).
        # Deltas are comparable only when ext_cores_max stayed below ~1.5.
        "loadavg_start": round(load_start, 2),
        "loadavg_1m": round(load_now, 2),
        "ext_cores": ext_cores,
        "ext_cores_max": round(max(ext_cores.values()), 2) if ext_cores else 0.0,
        "retried": retried,
        # runs the variance guard discarded (per query) — non-empty means
        # that query's window was bimodal and the reported median is the
        # tight cluster's, not the lottery's
        "variance_outliers": variance_outliers or {},
    }
    line_obj = {
        "metric": detail["metric"],
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": detail["sf"],
        "loadavg_start": detail["loadavg_start"],
        "ext_cores_max": detail["ext_cores_max"],
        "retries": sum(retried.values()),
    }
    line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > 1900:  # stdout-tail capture is ~2000 chars
        line_obj["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > 1900:
        # 1-decimal stage: keeps the full per-query map on the line (the
        # driver's parsed record) — BENCH_DETAIL.json holds 4-decimal
        # precision for cross-round deltas
        line_obj["queries"] = {k: round(v, 1) for k, v in timings.items()}
        line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > 1900:
        # context-field stage (r11: the headline names grew ~20 chars in
        # rotation and the 1-decimal line hit 1904): loadavg_start is
        # redundant with ext_cores_max (the authoritative in-run probe)
        # and retries is diagnostic — both live in BENCH_DETAIL.json; the
        # per-query map is what the driver grades, so it goes LAST
        line_obj.pop("loadavg_start", None)
        line_obj.pop("retries", None)
        line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > 1900:
        # final stage: the per-query map itself no longer fits (the
        # headline set keeps growing) — keep the parseable core and point
        # at the committed detail file instead of shipping a truncated
        # fragment (the r6 failure mode)
        line_obj["queries"] = "see BENCH_DETAIL.json"
        line = json.dumps(line_obj, separators=(",", ":"))
    return line, detail


if __name__ == "__main__":
    main()
