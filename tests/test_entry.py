"""Driver-contract smoke: entry() runs, queries()/oracle_sql() line up."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["category", "total_spend", "n_items"]


def test_correctness_window_priority():
    """The driver records the FIRST 50 queries() entries. Round-13
    rotation (COVERAGE.md governance): block 1 = changed evidence — the
    incremental-APSS stored state became a WAP-published parquet artifact
    (VERDICT r12 #2) and the JPEG codec gained the progressive (SOF2)
    decode path (VERDICT r12 #4: the refactored baseline roundtrip plus
    the new progressive query's first driver row); block 2 = the 47
    oldest-evidence queries (last hash-green rounds 5-6). Every slot
    must have an oracle — rows-only slots can only ever record
    err:no_oracle and are banned from the window (VERDICT r9 #2)."""
    qs = list(entrymod.queries())
    os_ = entrymod.oracle_sql()
    window = qs[:50]
    missing = [n for n in window if n not in os_]
    assert not missing, missing
    must = {
        # changed evidence (r13): WAP-materialized APSS state + the
        # progressive-JPEG codec path (shared decoder refactor)
        "dedup_incremental_apss",
        "multimodal_jpeg_roundtrip",
        "multimodal_jpeg_progressive",
    }
    assert must <= set(window), must - set(window)
    # the window IS the pinned rotation list — no silent drift
    assert window == entrymod._PRIORITY
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
