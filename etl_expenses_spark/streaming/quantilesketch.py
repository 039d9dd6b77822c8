"""Streaming bottom-k quantile-sketch state — the stream twin of
plans/sketch_ops.py:quantile_sketch_weekly_rollup.

The bottom-k hash-rank sample is EXACTLY mergeable (bottom-k of a union is
the bottom-k of the per-part bottom-k's), so folding each micro-batch's
k-row sample into a k-row persistent state yields, after ANY
micro-batching of the input, byte-identical state to the one-shot batch
sketch over the same rows. That is a stronger contract than the streaming
Misra-Gries sink's (whose summary content depends on batching and needs a
recount pass): here the state itself is the canonical sketch, so the
driver query gets a REAL declarative oracle, not a golden.

State layout and commit protocol mirror streaming/heavyhitters.py exactly
(the audited pattern): epoch-versioned ``state-{epoch}.parquet`` (k rows of
(rk string, v bigint)), ``_meta.json`` swapped atomically via
tempfile+os.replace, stale states GC'd after the swap. Replay of the one
in-flight epoch is skipped (its commit completed); an epoch BELOW the
committed last_epoch means a lost/reset checkpoint and FAILS FAST — the
r6-audited exactly-once discipline shared by every state sink here.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _read_meta(state_dir: str) -> dict:
    meta_path = os.path.join(state_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {"total": 0, "last_epoch": -1, "state": None}


def bottomk_state_sink(
    rows: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 64,
    rank_col: str = "rk",
    value_col: str = "v",
):
    """Start an availableNow foreachBatch query folding (rank_col,
    value_col) rows into the k-row bottom-k sketch state at ``state_dir``.
    Returns the StreamingQuery. Per batch: one distributed TakeOrdered
    (the batch's own bottom-k) unioned with the ≤ k state rows and cut to
    k — O(k) state forever, the batch's row count never reaches the
    driver as anything but a metadata total."""
    missing = [c for c in (rank_col, value_col) if c not in rows.columns]
    if missing:
        raise ValueError(
            f"bottomk_state_sink: stream is missing {missing} "
            f"(got {rows.columns})"
        )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        meta = _read_meta(state_dir)
        if epoch_id == meta["last_epoch"]:
            return  # replay of the one batch whose commit completed
        if epoch_id < meta["last_epoch"]:
            raise RuntimeError(
                f"bottomk_state_sink: epoch {int(epoch_id)} < committed "
                f"last_epoch {meta['last_epoch']} at {state_dir} — the "
                "stream's checkpoint was lost or reset; silently skipping "
                "would drop new data. Restore the checkpoint or start a "
                "fresh state_dir."
            )
        batch_n = batch_df.count()
        # ties ordered by (rk, v) — the same total order as the batch
        # sketch's array_sort over (rk, cents) structs, so which tied row
        # survives the k-cut is deterministic and the byte-identical-state
        # contract holds even for streams with colliding rank keys
        batch_k = batch_df.select(
            F.col(rank_col).alias("rk"), F.col(value_col).alias("v")
        ).orderBy("rk", "v").limit(k)
        if meta["state"]:
            prev = spark.read.parquet(os.path.join(state_dir, meta["state"]))
            batch_k = batch_k.unionByName(prev)
        new_state = batch_k.orderBy("rk", "v").limit(k)

        state_name = f"state-{int(epoch_id)}.parquet"
        new_state.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_dir, state_name)
        )
        fd, tmp = tempfile.mkstemp(dir=state_dir, prefix="._meta")
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"total": meta["total"] + batch_n,
                 "last_epoch": int(epoch_id), "state": state_name}, f
            )
        os.replace(tmp, os.path.join(state_dir, "_meta.json"))
        for name in os.listdir(state_dir):
            if name != state_name and name.startswith("state-"):
                shutil.rmtree(os.path.join(state_dir, name),
                              ignore_errors=True)
            elif name.startswith("._meta"):
                # a crash between mkstemp and os.replace leaks the temp
                # meta file; it is dead the moment any later commit lands,
                # so sweep leftovers here rather than forever
                try:
                    os.unlink(os.path.join(state_dir, name))
                except OSError:
                    pass

    os.makedirs(state_dir, exist_ok=True)
    return (
        rows.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def quantiles_from_state(spark, state_dir: str, ps=(0.5, 0.9)) -> DataFrame:
    """One-row DataFrame (n_in_sketch, q_<p> ...) from the committed
    state: nearest-rank elements at index 1 + floor(p·(n−1)) of the
    value-sorted k-sample — the same estimator as the batch sketch."""
    meta = _read_meta(state_dir)
    if meta["state"] is None:
        raise RuntimeError(
            f"quantiles_from_state: no committed state at {state_dir}"
        )
    st = spark.read.parquet(os.path.join(state_dir, meta["state"]))
    agg = st.agg(F.array_sort(F.collect_list("v")).alias("vals"))
    n = F.size("vals")
    cols = [n.cast("bigint").alias("n_in_sketch")]
    for p in ps:
        idx = (F.lit(1) + F.floor(F.lit(p) * (n - 1))).cast("int")
        cols.append(
            F.element_at("vals", idx).cast("bigint").alias(
                f"q{int(p * 100)}"
            )
        )
    return agg.select(*cols)
