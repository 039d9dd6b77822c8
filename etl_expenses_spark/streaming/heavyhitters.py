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

Scale shape (VERDICT r6 #4b): the batch never crosses to the driver as raw
distinct-key counts — each partition folds its own MG summary inside one
Arrow-batched mapInPandas (the batch twin's kernel, shared via
``mg_partition_summaries``), so at most cap × num_partitions (key, weight)
rows reach the driver regardless of the batch's key cardinality. Merging
per-partition summaries then cutting to cap is the mergeable-summaries
merge, so the superset guarantee survives the two-level fold.

State layout (state_dir):
    state-{epoch}.parquet/   (key bigint, weight bigint)   <= cap rows
    _meta.json               {"total": N, "last_epoch": E,
                              "state": "state-{epoch}.parquet"}

Commit protocol (r6 ADVICE, atomicity): the new state is written to an
EPOCH-VERSIONED path first, then _meta.json is replaced atomically
(tempfile + os.replace) to point at it, then stale state dirs are
garbage-collected. A crash between any two steps leaves the meta pointing
at a complete prior state: replaying the interrupted epoch re-folds from
that state and re-commits — never a lost state, never a double-merge.

Exactly-once: foreachBatch may replay the LAST in-flight batch after a
failure; a replayed ``epoch_id == last_epoch`` is skipped (its commit
completed). ``epoch_id < last_epoch`` can only mean the stream restarted
against a LOST or RESET checkpoint (batch ids restart at 0); silently
skipping would drop every new batch with no error — an undercount — so it
fails fast instead, mirroring the CMS sink's guard
(streaming/pipeline.py cms_state_sink). Recovery is restoring the
checkpoint or starting a fresh state_dir.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

_TOTAL_KEY = None  # sentinel key: per-partition row count rides the summary


def _mg_fold(counters: dict[int, int], key: int, c: int, cap: int
             ) -> dict[int, int]:
    counters[key] = counters.get(key, 0) + c
    if len(counters) > cap:
        cut = sorted(counters.values(), reverse=True)[cap]
        counters = {k: v - cut for k, v in counters.items() if v > cut}
    return counters


def _merge_counts(state: dict[int, int], counts: dict[int, int], cap: int
                  ) -> dict[int, int]:
    """Mergeable-summaries merge: sum weights, then one generalized
    decrement to get back under cap."""
    for k, c in counts.items():
        state[k] = state.get(k, 0) + c
    if len(state) > cap:
        cut = sorted(state.values(), reverse=True)[cap]
        state = {k: v - cut for k, v in state.items() if v > cut}
    return state


def mg_partition_summaries(df: DataFrame, key_col: str, cap: int) -> DataFrame:
    """Per-partition Misra-Gries summaries as (key, weight) rows plus one
    (NULL, n_rows) row per partition carrying the partition's exact row
    count — ≤ (cap + 1) × num_partitions rows total. The same vectorized
    kernel as the batch twin (plans/advanced.py heavy_hitters_two_pass),
    which emits keys only; here weights ride along so summaries merge."""
    import pandas as pd

    def fold(batches):
        counters: dict[int, int] = {}
        n = 0
        for b in batches:
            n += len(b)
            for k, c in b[key_col].value_counts().items():
                counters = _mg_fold(counters, int(k), int(c), cap)
        keys = list(counters.keys()) + [None]
        weights = list(counters.values()) + [n]
        yield pd.DataFrame({"key": pd.array(keys, dtype="Int64"),
                            "weight": weights})

    return df.select(df[key_col].alias(key_col)).mapInPandas(
        fold, schema="key bigint, weight bigint"
    )


def _read_meta(state_dir: str) -> dict:
    meta_path = os.path.join(state_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        # pre-r7 layout: fixed state.parquet path, no pointer in the meta
        meta.setdefault("state", "state.parquet")
        return meta
    return {"total": 0, "last_epoch": -1, "state": None}


def mg_state_sink(events: DataFrame, state_dir: str, checkpoint_dir: str,
                  cap: int = 512, key_col: str = "user_id"):
    """Start an availableNow foreachBatch query folding `key_col` into the
    MG state at state_dir. Returns the StreamingQuery."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        meta = _read_meta(state_dir)
        if epoch_id == meta["last_epoch"]:
            return  # replay of the one batch whose commit completed
        if epoch_id < meta["last_epoch"]:
            raise RuntimeError(
                f"mg_state_sink: epoch {int(epoch_id)} < committed "
                f"last_epoch {meta['last_epoch']} at {state_dir} — the "
                "stream's checkpoint was lost or reset (batch ids restarted), "
                "and silently skipping would drop new data with no error. "
                "Restore the checkpoint or start a fresh state_dir."
            )
        # distributed pre-aggregation: ≤ (cap+1)·partitions rows cross to
        # the driver, never the batch's raw key space
        rows = mg_partition_summaries(batch_df, key_col, cap).collect()
        counts: dict[int, int] = {}
        batch_n = 0
        for r in rows:
            if r["key"] is None:
                batch_n += r["weight"]
            else:
                counts[r["key"]] = counts.get(r["key"], 0) + r["weight"]
        if len(counts) > cap:
            cut = sorted(counts.values(), reverse=True)[cap]
            counts = {k: v - cut for k, v in counts.items() if v > cut}
        state: dict[int, int] = {}
        if meta["state"]:
            state = {
                r["key"]: r["weight"]
                for r in spark.read.parquet(
                    os.path.join(state_dir, meta["state"])
                ).collect()
            }
        state = _merge_counts(state, counts, cap)
        total = meta["total"] + batch_n

        # epoch-versioned write, then atomic meta swap, then GC
        state_name = f"state-{int(epoch_id)}.parquet"
        (
            spark.createDataFrame(
                list(state.items()) or [(None, None)], "key bigint, weight bigint"
            )
            .filter("key IS NOT NULL")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(state_dir, state_name))
        )
        fd, tmp = tempfile.mkstemp(dir=state_dir, prefix="._meta")
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"total": total, "last_epoch": int(epoch_id),
                 "state": state_name}, f
            )
        os.replace(tmp, os.path.join(state_dir, "_meta.json"))
        for name in os.listdir(state_dir):
            if name != state_name and (
                name.startswith("state-") or name == "state.parquet"
            ):
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
            elif name.startswith("._meta"):
                # sweep temp meta files leaked by a crash pre-os.replace
                try:
                    os.unlink(os.path.join(state_dir, name))
                except OSError:
                    pass

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

    meta = _read_meta(state_dir)
    if meta["state"] is None:
        raise RuntimeError(
            f"heavy_hitters_from_state: no committed state at {state_dir}"
        )
    total = meta["total"]
    cands = spark.read.parquet(os.path.join(state_dir, meta["state"])).select(
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
