"""HLL sketch estimates stay within sane error of exact distinct counts."""

from __future__ import annotations

from etl_expenses_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def test_hll_estimates_close_to_exact(spark):
    rows = REGISTRY["sketch_hll_distinct_users"].build(spark, SF_DIR).collect()
    assert len(rows) == 6  # 5 event types + merged ALL
    for r in rows:
        err = abs(r.est_users - r.exact_users) / max(r.exact_users, 1)
        assert err < 0.05, f"{r.event_type}: est={r.est_users} exact={r.exact_users}"
    all_row = [r for r in rows if r.event_type == "ALL"][0]
    per_max = max(r.exact_users for r in rows if r.event_type != "ALL")
    assert all_row.exact_users >= per_max  # union can only grow
