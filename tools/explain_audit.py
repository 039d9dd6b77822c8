"""Physical-plan audit for the headline queries.

For every query in bench.py's HEADLINE set, capture the formatted Catalyst
physical plan and assert the properties that matter at 100 TB:

- no CartesianProduct / BroadcastNestedLoopJoin anywhere (a nested-loop at
  sf0.1 is a cluster-killer at sf1000);
- parquet scans carry PushedFilters when the query filters scan columns;
- scans prune columns (ReadSchema never re-reads the full table width for
  narrow projections);
- WholeStageCodegen spans exist (row-local expression work is JVM-compiled,
  not interpreted).

Writes PLANS.md (plan text per query) and exits non-zero on any violation:

    python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from etl_expenses_spark.plans import REGISTRY  # noqa: E402
from etl_expenses_spark.session import get_spark  # noqa: E402

# Queries whose plan legitimately lacks a codegen span (pure pandas-UDF
# stages) — none today; kept explicit so additions are audited.
NO_CODEGEN_OK: set[str] = set()

# Queries where a BroadcastNestedLoopJoin is the RIGHT plan: joining a
# one-row broadcast side (the query vector) against the table. A BNLJ with a
# single-row build side is a constant-cost per-partition probe, not O(n*m).
BNLJ_OK: set[str] = {
    "similarity_cosine_topk",
    "similarity_cosine_topk_ivf",
    "similarity_cosine_topk_pq",  # one-row query vector crossJoined for rerank
    "similarity_batch_topk",  # 8-row query batch crossJoined (broadcast)
    # single-row aggregate crossJoins (corpus size / funnel stage counts):
    # the broadcast side is exactly 1 row, so the "nested loop" is a
    # constant-cost per-partition probe
    "tfidf_top_terms_per_doc",
    "funnel_view_click_purchase",
    "corpus_curation_funnel",  # five 1-row x 1-row stage-count joins
    # 1-row edge-summary x 1-row node-count crossJoins:
    "ktruss_copurchase",
    "ktruss_copurchase_capped",
    # scalar-average subquery: the broadcast side is the one-row avg_bal
    "tpch_q22_global_sales_opportunity",
    # one-row (total, part-count) broadcast for the HAVING threshold
    "tpch_q11_important_stock",
    # one-row (total_tokens, n_sources) broadcast building the budget table
    "corpus_mixture_rebalance",
    # one-row (total, n_users) broadcast for the share threshold
    "heavy_hitters_users",
    # one-row event-total broadcast for the exact n*256 > t gate
    "heavy_hitters_two_pass",
    "sequence_gap_detection",
    "dedup_keep_best_quality",
    "monthly_spend_mom_delta",
    "sql_pipe_syntax_agg",
    # one-row (total_weight // k) step broadcast for systematic PPS picks
    "pps_sample_documents",
    # one-row (N, S) corpus-stats broadcast feeding the BM25 formula
    "bm25_topk_per_query",
    # one-row COUNT(*) broadcast fixing the decile denominator
    "equidepth_histogram_totals",
    # one-row COUNT(*) broadcast feeding NTILE's exact fill rule
    "curriculum_quality_bins",
    # 1x1-row join of the conditional-agg scan with the FK anti-join count
    "expectations_report_orders",
    # 3-row CMS row-index relation broadcast-crossed with keys
    "countmin_user_frequency",
    # three one-row COUNT(*) broadcasts fixing the quintile denominators
    "rfm_segmentation",
    # one-row basket-count broadcast for support/lift denominators
    "basket_pair_lift",
    # ref-vs-cur one-row stat sides cross-joined for the delta report
    "data_drift_monitor",
    # one-row total broadcast for the digit shares
    "benford_first_digit_screen",
    # one-row (n, total) broadcast for decile boundaries and shares
    "pareto_revenue_concentration",
    # one-row total-weight broadcast for the crossing predicate
    "weighted_median_spend",
    # day-granularity sketch relation range-self-joined (<=365 rows/year
    # regardless of event volume — the sketch union IS the reduction)
    "hll_sliding_7d_users",
    # r10: the 3D skyline's MERGE pass theta-joins the union of LOCAL
    # skylines under the dominance predicate — the broadcast side is
    # skyline-sized (polylog for independent dims), bounded by the local
    # SFS pass, never the relation; the BNLJ is the bounded final pass the
    # two-phase algorithm is built around
    "skyline_orders_3d",
    # r11: the multiprobe LSH tier crossJoins the build-side signatures
    # with the broadcast FLIP relation (Σ C(m,f) rows, 697 at m=16 f≤3 —
    # a constant independent of data size); the candidate join itself is
    # a hash equi-join on (band, bucket)
    "dedup_embedding_lsh_tuned",
}


# Queries whose plan legitimately contains an UNPARTITIONED Window (the
# "No Partition Defined ... single partition" warning): allowed ONLY with
# a stated row-count bound — a global window is correct exactly when its
# input is provably small by construction (VERDICT r10 #9). Every entry
# names the bound; an unlisted query with a global window fails the audit.
GLOBAL_WINDOW_OK: dict[str, str] = {
    # post-aggregation DAY grain: <= ~2.5k rows over the 7-year order
    # domain, growing with calendar time only, never with order volume
    # (plans/temporal_ops.py running in-transit sum)
    "shipments_in_transit_daily": "day-grain running sum (<= ~2.5k rows)",
    # global term index over the DISTINCT FREQUENCY-RANKED vocabulary
    # (operators/apss.py:term_index) — bounded by token diversity, not
    # corpus size; the prefix-filter lemma needs the one total order
    "allpairs_cosine_prefix_join": "distinct-term index (vocab-bounded)",
    # 2 partition-boundary rows PER RANGE PARTITION (first/last of each),
    # i.e. 2*shuffle.partitions rows regardless of corpus size
    # (plans/dedup_ops.py bwin — lag+lead = 2 specs over one window)
    "dedup_spans_suffix_array": "2 boundary rows per range partition",
    # the two-phase skyline's MERGE pass windows over the UNION OF LOCAL
    # SKYLINES (skyline-sized per partition — polylog for independent
    # dims, never the relation); the pass partitions on a literal pid
    # that Catalyst constant-folds away, which is why it surfaces as a
    # global window. 4 specs = phase-2 sweeps of the layered view build
    # plus the delta fold (plans/relational_ext.py two_phase).
    "skyline_delete_maintenance": "union of local skylines (phase-2 merge)",
}


def plan_string(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def _global_windows(plan: str) -> int:
    """Count window specs with an EMPTY partition clause. The robust
    marker is the head of ``windowspecdefinition(...)``: partition columns
    come first as plain attributes; when the partition spec is empty the
    first argument is either an ORDER expression (``col ASC/DESC NULLS
    ...``) or directly the ``specifiedwindowframe``. (Bracket-counting the
    ``Arguments:`` line is unreliable: formatted explain truncates long
    lines, and order-less partitioned windows print only two groups.)"""
    import re

    pat = re.compile(
        r"windowspecdefinition\((?:[^,()]+ (?:ASC|DESC)|specifiedwindowframe)"
    )
    return len(pat.findall(plan))


def audit(name: str, plan: str) -> list[str]:
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct in plan")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
        problems.append("BroadcastNestedLoopJoin in plan")
    # formatted mode labels whole-stage-codegen membership per node
    if "codegen id" not in plan and name not in NO_CODEGEN_OK:
        problems.append("no whole-stage-codegen span")
    gw = _global_windows(plan)
    if gw and name not in GLOBAL_WINDOW_OK:
        problems.append(
            f"{gw} unpartitioned Window node(s) without a stated bound "
            "(add to GLOBAL_WINDOW_OK with the row-count argument)"
        )
    # every scan of a parquet source must prune columns: the ReadSchema
    # clause exists on all of them; spot obvious full-width reads is manual,
    # but a scan with a filter above it and no pushed filter is mechanical:
    return problems


# Beyond bench's HEADLINE: every later-added join/agg query whose physical
# plan shape matters at scale (the row-level function demos are audited
# implicitly — they fuse into scans).
EXTRA = [
    # round-4 additions
    "theta_retention_daily",
    "theta_weekly_rollup_from_daily",
    "winsorized_spend_by_segment",
    "mad_spend_by_segment",
    "pps_sample_stratified_by_source",
    "vocab_coverage_topk",
    "session_bounce_rate_daily",
    "similarity_batch_topk",
    "k_anonymity_report",
    "pseudonymize_stable_ids",
    "countmin_user_frequency",
    "incremental_agg_state_merge",
    "triangle_count_copurchase",
    "zorder_curve_values",
    "colocated_join_spend_by_segment",
    "compaction_plan_documents",
    "expectations_report_orders",
    "sample_deterministic_per_key",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "having_large_orders",
    "range_join_recent_clicks",
    "merge_upsert_orders",
    "null_safe_join",
    "window_distribution_ranks",
    "variant_props_rollup",
    "agg_dispersion_stats",
    "tpch_q10_returned_items",
    "sql_exists_and_scalar_subquery",
    "tfidf_top_terms_per_doc",
    "funnel_view_click_purchase",
    "dedup_cluster_components",
    "scd2_customer_segments",
    "sql_udf_money_parse",
    "webhook_source_ingest",
    "tpch_q12_priority_shipmode",
    "tpch_q19_disjunctive_revenue",
    "histogram_order_totals",
    "gapfill_daily_user_values",
    "dataset_split_leakage_safe",
    "embedding_quantize_int8",
    "sql_recursive_month_spine",
    "tpch_q14_promo_revenue",
    "tpch_q4_order_priority_check",
    "tpch_q6_forecast_revenue",
    "agg_bitwise_flags",
    "agg_collect_priorities",
    "gold_denormalized_sales",
    "zorder_layout_key",
    "tpch_q7_nation_trade_volume",
    "tpch_q8_market_share",
    "attribution_first_purchase_after_click",
    "decontaminate_benchmark_overlap",
    "tpch_q9_nation_profit",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q20_excess_stock_suppliers",
    # (tpch_q21_waiting_supplier is audited via bench HEADLINE)
    "table_profile_orders",
    "agg_partial_remerge_monthly",
    "snapshot_diff_cdc",
    "heavy_hitters_users",
    "sequence_gap_detection",
    "dedup_keep_best_quality",
    "monthly_spend_mom_delta",
    "sql_pipe_syntax_agg",
    "corpus_mixture_rebalance",
    "corpus_pack_sequences",
    "pdf_ticket_pipeline",
    "xlsx_report_pipeline",
    "doc_chunk_sliding",
    "text_redact_pii",
    "text_repetition_ratio",
    "sample_stratified_by_lang",
    "sample_n_per_group",
    "string_regex_functions",
    "temporal_scalar_functions",
    "codec_hash_functions",
    "text_features",
    # round 3
    "corpus_shuffle_deterministic",
    "curriculum_quality_bins",
    "multimodal_codec_roundtrip",
    "embedding_pq_codes",
    "similarity_cosine_topk_pq",
    # behavior / entity-resolution / prefix-sum surface
    "cohort_retention_monthly",
    "event_transition_matrix",
    "fuzzy_match_part_names",
    "fuzzy_best_match_dirty_parts",
    "prefix_sum_document_bytes",
    "pps_sample_documents",
    "doc_length_outliers",
    "ab_experiment_lift",
    "equidepth_histogram_totals",
    "gapfill_interpolate_linear",
    "table_checksum_orders",
    "pit_join_events_user_tier",
    "rolling_7d_active_users",
    "trend_daily_spend_slope",
    "keyset_pagination_orders",
    "feature_hashing_tokens",
    "installment_schedule_expansion",
    "fx_convert_order_totals",
    "running_value_resets_on_signup",
    "top_user_journeys",
    "proportional_budget_allocation",
    "multitouch_attribution_credits",
    "correlation_r2_qty_price",
    "corpus_summary_card",
    "growth_accounting_daily",
    "rfm_segmentation",
    "basket_pair_lift",
    "seasonal_naive_backtest",
    "fuzzy_entity_clusters",
    "data_drift_monitor",
    "benford_first_digit_screen",
    "pareto_revenue_concentration",
    "gini_spend_inequality",
    "weighted_median_spend",
    # round 5
    "inverted_index_postings",      # postings re-encoded as sorted string
    "link_prediction_jaccard_capped",  # degree-capped wedge tier
    "multimodal_jpeg_roundtrip",    # JPEG decode through mapInPandas
    "multimodal_png_roundtrip",     # PNG lossless decode, bit-identity
    "multimodal_container_census",  # header-only MP4/MP3 probe, no decode
    "semantic_dedup_prune",         # SemDeDup: cluster -> in-cell cosine -> CC
    "media_tags_census",            # ID3/Vorbis tag extraction table
    "corpus_curation_funnel",       # end-to-end curation composition
    "archive_member_census",        # ZIP central-directory walk
    "merge_evolved_schema_orders",  # schema-evolving incremental merge
    "hll_sliding_7d_users",         # sketch-union sliding window
    "warc_record_census",           # Common Crawl record walk
    # round 6 (non-headline additions)
    "ewma_daily_revenue",           # lag-stack integer kernel over day grain
    "cusum_changepoint_screen",     # prefix-sum CUSUM identity, two windows
    "trend_slope_by_segment",       # closed-form OLS in DECIMAL(38,0)
    "gopher_dup_ngram_chars",       # dup-5-gram char mass, explode+2 aggs
    "quality_percentile_gate_by_lang",  # rank gate per language stratum
    "arrow_grouped_weighted_median",    # applyInArrow grouped UDF surface
    "avro_source_roundtrip",        # Python DataSource write->infer->read
    # round 7 (non-headline additions)
    "url_canonicalize_dedup",       # scan-fused URL canon + exact dedup
    "kcore_copurchase_capped",      # mutual-capped k-core scale tier
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    # AQE wraps plans in AdaptiveSparkPlan and defers codegen annotation to
    # runtime; the audit is about the STATIC plan Catalyst picks (pushdown,
    # join strategy, codegen coverage), so turn AQE off here only. The
    # engine runs with AQE on (session.py) — at cluster scale it can only
    # improve on what we assert statically.
    spark = get_spark("explain_audit", extra_conf={"spark.sql.adaptive.enabled": "false"})
    failures: dict[str, list[str]] = {}
    sections = []
    for name in HEADLINE + EXTRA:
        df = REGISTRY[name].build(spark, sf_dir)
        plan = plan_string(df)
        probs = audit(name, plan)
        if probs:
            failures[name] = probs
        doc = (REGISTRY[name].doc or "").strip()
        sections.append(
            f"## {name}\n\n{doc}\n\n```\n{plan.strip()}\n```\n"
        )
        status = "FAIL " + "; ".join(probs) if probs else "ok"
        print(f"{status:5s}  {name}")

    header = (
        "# PLANS — physical plans of the headline queries\n\n"
        f"Generated by `tools/explain_audit.py` at `{sf_dir}`.\n"
        "Audited invariants: no nested-loop/cartesian joins, filters pushed\n"
        "to parquet scans, pruned ReadSchema, WholeStageCodegen coverage.\n\n"
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(header + "\n".join(sections))

    if failures:
        print(f"\n{len(failures)} queries violate plan invariants: {failures}")
        sys.exit(1)
    print(f"\nall {len(HEADLINE + EXTRA)} audited plans clean; PLANS.md written")


if __name__ == "__main__":
    main()
