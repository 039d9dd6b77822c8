"""Idempotent append — the reference's exactly-once loading core.

Re-expresses J1-J4 (SURVEY.md §2.4): the reference reads the target's
DISTINCT keys into a Python set and skips already-loaded batches
(`/root/reference/load_data/lambda_function.py:39-73,164-200`,
`extract_data_pdf/lambda_function.py:140-147`). Here it's a single
``left_anti`` join — distributed, no driver-side set, no O(target) memory:

- Small target-key side → Catalyst broadcasts it automatically.
- Huge target → the anti-join shuffles on the key, which AQE handles;
  at 100 TB the right design is a date-partitioned gold table so the
  anti-join only scans the partitions the batch can overlap (pass
  ``target_pruned`` accordingly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame


def new_rows(batch: DataFrame, target: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``batch`` whose key is absent from ``target`` (left_anti)."""
    return batch.join(target.select(*keys).distinct(), on=list(keys), how="left_anti")


def upsert(updates: DataFrame, target: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE semantics without a transactional table format: rows of
    ``updates`` replace target rows with the same key; all other target rows
    pass through. ``updates ∪ (target ⟕anti updates)`` — one anti-join
    shuffle (or broadcast when the batch is small, the common case: a daily
    batch vs a 100 TB gold table broadcasts the BATCH key set). Pair with
    operators/wap.py to publish the rewritten partitions atomically; at
    scale, pre-filter ``target`` to the partitions the batch touches so the
    rewrite is partition-local, not a full-table scan."""
    keep = target.join(updates.select(*keys).distinct(), on=list(keys), how="left_anti")
    return updates.unionByName(keep)


def merge_append(
    batch: DataFrame,
    target_path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> int:
    """Append only not-yet-loaded rows of ``batch`` to the parquet table at
    ``target_path``. Returns the number of rows appended. Loading the same
    batch twice is a no-op (the idempotency property test in
    tests/test_merge.py — the J1-J4 contract)."""
    spark = batch.sparkSession
    try:
        target = spark.read.parquet(target_path)
    except AnalysisException as e:
        # Only a MISSING/EMPTY target means "first load": PATH_NOT_FOUND for
        # an absent dir, UNABLE_TO_INFER_SCHEMA for a dir with no parquet
        # files yet. Any other analysis error (corrupt footer, schema
        # problem, permissions surfaced as analysis) must propagate —
        # swallowing it would append the full batch and silently break the
        # exactly-once J1-J4 contract.
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            fresh = batch
        else:
            raise
    else:
        fresh = new_rows(batch, target, keys)
    fresh = fresh.cache()
    n = fresh.count()
    if n > 0:
        writer = fresh.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_path)
    fresh.unpersist()
    return n
