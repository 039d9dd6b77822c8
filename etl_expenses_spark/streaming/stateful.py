"""Custom stateful streaming operator via ``applyInPandasWithState``.

The one streaming shape Spark's built-in windowed aggregates cannot express:
an **unbounded running accumulator per key**, emitted every micro-batch —
the streaming analog of the reference's incremental totals (each batch
advances a persistent per-entity position, like the MAX(date) watermark +
running load counters in `/root/reference/load_data/lambda_function.py:74,117`
and `extract_data_pdf/lambda_function.py:56-108`, but per-key and pushed to
the state store instead of re-queried from the warehouse each run).

Scale design: state is partitioned by the grouping key across executors
(RocksDB-backed store in production), each micro-batch touches only the
keys present in that batch, and the pandas function receives Arrow batches
— no per-row Python. State size is O(distinct keys), not O(events).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _accumulate(key, pdf_iter, state: GroupState):
    """Fold this batch's rows for one user into the persistent (n, total)
    state; emit the updated running totals once per batch."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum()) if len(pdf) else 0.0
    state.update((n, float(total)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [float(total)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (n_events, total_value), updated each micro-batch.

    ``events`` must be a *streaming* DataFrame with (user_id, value).
    Output mode: update — only users seen in the batch re-emit.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
