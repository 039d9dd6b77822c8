"""Driver-contract smoke: entry() runs, queries()/oracle_sql() line up."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["category", "total_spend", "n_items"]


def test_correctness_window_priority():
    """The driver records the FIRST 50 queries() entries. Pin the window:
    every entry has a DuckDB oracle (no slot wasted on rows-only checks) and
    the §2-critical set the round-1 verdict called out is inside it."""
    qs = list(entrymod.queries())
    os_ = entrymod.oracle_sql()
    window = qs[:50]
    assert all(n in os_ for n in window), [n for n in window if n not in os_]
    must = {
        # round-8 rotation: 4 kept per-family green anchors (every other
        # slot is a first-time row — the COVERAGE.md round-8 candidate
        # list plus this round's new operators; cumulative driver coverage
        # is the goal, so the anchor set shrinks as families prove out)
        "flagship_spend_by_category",
        "derived_columns",
        "multimodal_codec_roundtrip",
        "dedup_cluster_components",
        # round-8 new surface shipping with driver evidence
        "geo_cell_join_nearby_pairs",
        "ivm_group_totals_cdc",
        "ivm_stream_fold",
        "wap_time_travel_read",
        # round-8 first-time slots the round's machinery depends on
        "heavy_hitters_stream_fold",
        "avro_stream_ingest_census",
        "bitmap_weekly_distinct_rollup",
        "embedding_pq_codes",
        "tpch_q2_min_cost_supplier",
    }
    assert must <= set(window), must - set(window)
    # nothing silently dropped: priority reordering preserves the registry
    assert set(qs) == set(entrymod.REGISTRY if hasattr(entrymod, "REGISTRY") else qs)
    assert len(qs) == len(set(qs))


def test_window_slots_are_harness_safe(spark):
    """No window slot may emit array/struct/map output columns: the driver
    harness canonicalizes results via pandas sort_values, which raises
    `unhashable type` on such cells (the r4 inverted_index_postings err).
    Schema analysis only — no job execution."""
    import pyspark.sql.types as st

    from etl_expenses_spark.plans import REGISTRY

    window = list(entrymod.queries())[:50]
    bad = {}
    for name in window:
        schema = REGISTRY[name].build(spark, "/root/testdata/sf0.001").schema
        cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (st.ArrayType, st.StructType, st.MapType))
        ]
        if cols:
            bad[name] = cols
    assert not bad, bad


def test_registry_consistency(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)
    # every callable is (spark, sf_dir) -> DataFrame; smoke one cheap one
    df = qs["distinct_segments"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_tracked_caches_cleared_between_query_builds(spark):
    """Persisted intermediates (e.g. tfidf's exploded tokens) must be
    dropped when the NEXT registry query builds — a 50-query driver
    session holds at most one query's cached blocks."""
    from etl_expenses_spark import caching
    from etl_expenses_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    caching.clear_tracked_caches()  # earlier tests may have left tracked caches
    df = REGISTRY["tfidf_top_terms_per_doc"].build(spark, sf)
    df.count()
    live = list(caching._TRACKED_CACHES)
    assert live, "tfidf should register a tracked persist"
    assert all(c.storageLevel.useMemory or c.storageLevel.useDisk for c in live)
    REGISTRY["distinct_segments"].build(spark, sf)  # next build clears it
    assert not caching._TRACKED_CACHES
    assert all(
        not (c.storageLevel.useMemory or c.storageLevel.useDisk) for c in live
    ), "tracked caches must be unpersisted by the next build"
