"""Degree-capped link prediction: the hot-node tier of
operators/graph.py (VERDICT r4 "Next round" #4).

Cross-engine value equality is check_oracle.py's job (both the exact and
the capped registry queries have full SQL oracles); these tests pin the
cap's SEMANTICS on planted graphs:

1. cap >= max degree  =>  bit-identical to the exact path,
2. a planted hot hub's wedge fan-out is bounded at C(cap, 2),
3. the hash-sample is deterministic (same rows on re-run, any partitioning).
"""

from __future__ import annotations

from itertools import combinations

from etl_expenses_spark.operators.graph import (
    capped_adjacency,
    jaccard_link_prediction,
)


def _edges_df(spark, pairs, num_partitions=None):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "pa long, pb long"
    )
    return df.repartition(num_partitions) if num_partitions else df


def _rows(df):
    return sorted(
        (r.pa, r.pb, r.n_common_neighbors, round(r.jaccard, 12))
        for r in df.collect()
    )


def _planted_graph():
    """Two communities plus a bridge, with one clique edge removed so the
    pair (4,5) is a high-overlap NON-edge (common neighbors {1,2,3},
    Jaccard 3/4) that survives the 1/5 threshold. Max degree 5."""
    comm_a = [e for e in combinations([1, 2, 3, 4, 5], 2) if e != (4, 5)]
    comm_b = list(combinations([10, 11, 12, 13], 2))  # clique of 4, deg 3
    bridge = [(5, 10)]
    return comm_a + comm_b + bridge


def test_cap_vs_uncapped_equality_below_cap(spark):
    edges = _edges_df(spark, _planted_graph())
    exact = _rows(jaccard_link_prediction(edges, max_degree=None))
    capped = _rows(jaccard_link_prediction(edges, max_degree=64))
    assert exact == capped
    assert exact  # the cliques produce non-edge candidates


def test_planted_hot_hub_fanout_is_bounded(spark):
    # one hub (id 0) connected to 50 spokes: uncapped, the hub's neighbor
    # list yields C(50,2)=1225 wedges; capped at 8 it must yield C(8,2)=28.
    hub_edges = [(0, s) for s in range(1, 51)]
    edges = _edges_df(spark, hub_edges)
    adj = capped_adjacency(edges, max_degree=8)
    per_node = {
        r.node: r.cnt
        for r in adj.groupBy("node").count().withColumnRenamed("count", "cnt").collect()
    }
    assert per_node[0] == 8          # hub capped
    assert all(v == 1 for n, v in per_node.items() if n != 0)  # spokes exact
    # wedge fan-out bound: candidates are exactly the hub's sampled C(8,2)
    out = jaccard_link_prediction(edges, max_degree=8, threshold_num=0)
    rows = out.collect()
    assert len(rows) == 28
    sampled = {r.nbr for r in adj.filter("node = 0").collect()}
    assert len(sampled) == 8
    for r in rows:
        assert r.pa in sampled and r.pb in sampled
        # spokes' only (reverse-capped) neighbor is the hub: Jaccard = 1/1
        assert r.n_common_neighbors == 1 and r.jaccard == 1.0


def test_capped_sample_is_deterministic_across_partitionings(spark):
    graph = _planted_graph() + [(0, s) for s in range(20, 60)]
    a = _rows(jaccard_link_prediction(_edges_df(spark, graph, 1), max_degree=6))
    b = _rows(jaccard_link_prediction(_edges_df(spark, graph, 7), max_degree=6))
    assert a == b and a


def test_degree_join_carries_no_broadcast_hint(spark):
    # r5 ADVICE: the degree relation is O(nodes); a pinned F.broadcast on
    # it risks driver OOM at scale. The logical plan must carry NO
    # broadcast hint — AQE may still pick a broadcast join at runtime when
    # the measured size fits, which is the desired adaptive behavior.
    out = jaccard_link_prediction(_edges_df(spark, _planted_graph()))
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()
