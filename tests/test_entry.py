"""Driver-contract smoke: entry() runs, queries()/oracle_sql() line up."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["category", "total_spend", "n_items"]


def test_registry_consistency(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)
    # every callable is (spark, sf_dir) -> DataFrame; smoke one cheap one
    df = qs["distinct_segments"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
