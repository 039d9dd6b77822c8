"""Streaming incremental view maintenance — the stream twin of
plans/ivm_ops.py (operators/ivm.py z-set fold), i.e. a continuously
maintained materialized aggregate: each CDC micro-batch folds its signed
deltas into the stored COUNT/SUM view, and the view is correct after every
commit without ever rescanning the base facts.

Unlike the MG sink (whose summary state must cross to the driver), the
fold here is FULLY distributed: maintain_grouped_totals is a DataFrame
union-aggregate, so the per-epoch cost is one map-side-combined shuffle of
O(|Δ| touched keys) rows regardless of batch size. The stored view is
rewritten per epoch — right for the bounded-group views this serves (the
state is the AGGREGATE, not the facts); a 100 TB-keyed view would swap the
rewrite for a partition-scoped MERGE keyed on the delta's touched keys,
with the identical fold algebra.

State layout + commit protocol are the MG sink's (streaming/
heavyhitters.py): epoch-versioned ``view-{epoch}.parquet`` → atomic
``_meta.json`` replace → stale-state GC. Replay of the one committed
epoch is skipped; ``epoch_id < last_epoch`` means a lost/reset checkpoint
and fails fast instead of silently dropping data.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _read_meta(state_dir: str) -> dict:
    meta_path = os.path.join(state_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {"last_epoch": -1, "view": None}


def _commit(spark: SparkSession, state_dir: str, view: DataFrame,
            epoch_id: int) -> None:
    """Epoch-versioned write → atomic meta swap → GC (crash-safe: a crash
    between steps leaves the meta at a complete prior view)."""
    name = f"view-{int(epoch_id)}.parquet"
    view.write.mode("overwrite").parquet(os.path.join(state_dir, name))
    fd, tmp = tempfile.mkstemp(dir=state_dir, prefix="._meta")
    with os.fdopen(fd, "w") as f:
        json.dump({"last_epoch": int(epoch_id), "view": name}, f)
    os.replace(tmp, os.path.join(state_dir, "_meta.json"))
    for n in os.listdir(state_dir):
        if n != name and n.startswith("view-"):
            shutil.rmtree(os.path.join(state_dir, n), ignore_errors=True)
        elif n.startswith("._meta"):
            # sweep temp meta files leaked by a crash pre-os.replace
            try:
                os.unlink(os.path.join(state_dir, n))
            except OSError:
                pass


def init_view_state(view: DataFrame, state_dir: str) -> None:
    """Seed the state with the base view (epoch −1): the stored aggregate
    the stream maintains from then on. Normalizes the money column to
    DECIMAL(38,2) so every later fold re-writes the identical schema."""
    from pyspark.sql import functions as F

    os.makedirs(state_dir, exist_ok=True)
    _commit(
        view.sparkSession,
        state_dir,
        view.withColumn("total", F.col("total").cast("decimal(38,2)")),
        -1,
    )


def read_view(spark: SparkSession, state_dir: str) -> DataFrame:
    meta = _read_meta(state_dir)
    if meta["view"] is None:
        raise RuntimeError(f"ivm_state_sink: no committed view at {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, meta["view"]))


def ivm_state_sink(
    cdc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "key",
    key_old: str = "key_old",
    amt_old: str = "amt_old",
    key_new: str = "key_new",
    amt_new: str = "amt_new",
):
    """Start an availableNow foreachBatch query folding the CDC stream's
    I/U/D rows into the stored view at state_dir (seeded by
    init_view_state). Returns the StreamingQuery."""
    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.ivm import (
        maintain_grouped_totals,
        zset_from_cdc,
    )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        meta = _read_meta(state_dir)
        if epoch_id == meta["last_epoch"]:
            return  # replay of the one batch whose commit completed
        if epoch_id < meta["last_epoch"]:
            raise RuntimeError(
                f"ivm_state_sink: epoch {int(epoch_id)} < committed "
                f"last_epoch {meta['last_epoch']} at {state_dir} — the "
                "stream's checkpoint was lost or reset; silently skipping "
                "would drop CDC batches with no error. Restore the "
                "checkpoint or re-seed the state_dir."
            )
        deltas = zset_from_cdc(batch_df, key_old, amt_old, key_new, amt_new)
        new_view = maintain_grouped_totals(
            read_view(spark, state_dir), deltas, key=key
        ).withColumn("total", F.col("total").cast("decimal(38,2)"))
        _commit(spark, state_dir, new_view, epoch_id)

    return (
        cdc_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
