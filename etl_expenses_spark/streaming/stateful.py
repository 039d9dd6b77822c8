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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): the successor API — typed state
# handles (value/list/map), per-state TTL, timers. Used here for TTL-bounded
# stream dedup: dropDuplicates+watermark bounds state by EVENT time;
# a TTL value-state bounds it by PROCESSING time, which is what you want
# when replays can arrive with arbitrary event timestamps (the reference's
# re-delivered webhook problem, `webhook_mp_report/lambda_function.py:14-50`).
# State size stays O(keys seen within TTL), evicted by the store itself.
# ---------------------------------------------------------------------------
try:  # Spark 4 API — gate so the module imports on 3.5 too
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TtlDedupProcessor(StatefulProcessor):
        """Emit each key's FIRST occurrence; remember it for ttl_ms."""

        def __init__(self, ttl_ms: int = 3_600_000):
            self._ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "seen boolean", ttlDurationMs=self._ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            if not self._seen.exists():
                self._seen.update((True,))
                first = next(iter(rows))
                yield first.head(1)

        def close(self) -> None:
            pass

    def dedup_events_ttl(events: DataFrame, ttl_ms: int = 3_600_000) -> DataFrame:
        """TTL-bounded exactly-once-per-key stream: first row per event_id
        passes; duplicates within the TTL window are dropped by state the
        store expires on its own.

        Requires the protobuf wheel (the transformWithState Python worker
        serializes state over protobuf) — absent in this container, so the
        call is gated with a clear remedy; the applyInPandasWithState path
        above is the fully-tested stateful operator here."""
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "transformWithStateInPandas needs the 'protobuf' package "
                "(pip install protobuf) for its state-serialization worker"
            ) from e
        return events.groupBy("event_id").transformWithStateInPandas(
            TtlDedupProcessor(ttl_ms),
            outputStructType=events.schema,
            outputMode="append",
            timeMode="processingTime",
        )

except ImportError:  # pragma: no cover
    TtlDedupProcessor = None  # type: ignore[assignment]

    def dedup_events_ttl(events: DataFrame, ttl_ms: int = 3_600_000) -> DataFrame:
        raise NotImplementedError("transformWithStateInPandas requires Spark >= 4.0")
