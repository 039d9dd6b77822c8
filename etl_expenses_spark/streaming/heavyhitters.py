"""Streaming Misra-Gries heavy-hitter state — the stream twin of
plans/advanced.py:heavy_hitters_two_pass.

Each micro-batch folds its keys into a bounded MG summary (capacity keys +
a running total), exactly the mergeable-summaries formulation the batch
query uses per partition: merge weights, then subtract the (cap+1)-th
largest weight from everyone and drop the non-positive. The state is
therefore a guaranteed SUPERSET of every key whose share of ALL events
streamed so far exceeds 1/(cap+1) — a recount pass over the candidates
gives the exact heavy-hitter set without ever shuffling the key space,
batch after batch.

State layout (state_dir):
    state.parquet/   (key bigint, weight bigint)   <= cap rows
    _meta.json       {"total": N, "last_epoch": E}

Exactly-once: foreachBatch may replay a batch after a failure; a replayed
``epoch_id <= last_epoch`` is skipped, so weights never double-merge (the
same epoch-ledger idea as the JDBC sink's publish protocol). The state is
<= cap rows by construction, so the driver-side merge is O(cap log cap) —
bounded regardless of stream volume.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _merge_counts(state: dict[int, int], counts: dict[int, int], cap: int
                  ) -> dict[int, int]:
    for k, c in counts.items():
        state[k] = state.get(k, 0) + c
    if len(state) > cap:
        cut = sorted(state.values(), reverse=True)[cap]
        state = {k: v - cut for k, v in state.items() if v > cut}
    return state


def mg_state_sink(events: DataFrame, state_dir: str, checkpoint_dir: str,
                  cap: int = 512, key_col: str = "user_id"):
    """Start an availableNow foreachBatch query folding `key_col` into the
    MG state at state_dir. Returns the StreamingQuery."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        meta_path = os.path.join(state_dir, "_meta.json")
        state_path = os.path.join(state_dir, "state.parquet")
        meta = {"total": 0, "last_epoch": -1}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        if epoch_id <= meta["last_epoch"]:
            return  # replayed batch: already folded
        # distributed pre-aggregation: the batch crosses to the driver as
        # at most (distinct keys in batch) rows, and the MG cut keeps the
        # stored state at <= cap rows
        counts = {
            r["k"]: r["c"]
            for r in batch_df.groupBy(batch_df[key_col].alias("k"))
            .count()
            .withColumnRenamed("count", "c")
            .collect()
        }
        state: dict[int, int] = {}
        if os.path.exists(state_path):
            state = {
                r["key"]: r["weight"]
                for r in spark.read.parquet(state_path).collect()
            }
        state = _merge_counts(state, counts, cap)
        total = meta["total"] + sum(counts.values())
        (
            spark.createDataFrame(
                list(state.items()) or [(None, None)], "key bigint, weight bigint"
            )
            .filter("key IS NOT NULL")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(state_path)
        )
        with open(meta_path, "w") as f:
            json.dump({"total": total, "last_epoch": epoch_id}, f)

    os.makedirs(state_dir, exist_ok=True)
    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def heavy_hitters_from_state(spark, state_dir: str, events: DataFrame,
                             key_col: str = "user_id",
                             denom: int = 256) -> DataFrame:
    """Recount pass: exact counts of the state's candidate keys over
    `events`, gated at share > 1/denom of the STREAMED total — identical
    output to the batch two-pass query when the state has seen the same
    rows. Requires denom < cap+1 (else the superset guarantee is void)."""
    from pyspark.sql import functions as F

    with open(os.path.join(state_dir, "_meta.json")) as f:
        total = json.load(f)["total"]
    cands = spark.read.parquet(os.path.join(state_dir, "state.parquet")).select(
        F.col("key").alias(key_col)
    )
    return (
        events.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * denom > F.lit(total))
        .select(
            key_col,
            "n",
            (F.col("n").cast("double") / F.lit(float(total))).alias("share"),
        )
    )
