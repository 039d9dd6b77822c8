"""K6 alert sink: failed streaming work → quarantine/alert table.

The reference's compensation flow publishes an SNS alert with the error
detail when the ETL fails (`/root/reference/compensation_flow/
lambda_function.py:63-68`). The engine analog is a
``StreamingQueryListener``: every query termination that carries an
exception appends one alert row (query name/id/run id, error text, UTC
timestamp) to a parquet alerts table that downstream monitoring (or a
compensation job — see operators/wap.py:vacuum for the cleanup half)
consumes like any other table.

The listener writes with pyarrow directly — listener callbacks run on the
listener-bus thread, and appending a single row must not depend on (or
block) the very SparkSession whose query just died. One small file per
failure is the right trade: alerts are rare, and the table stays readable
by ``spark.read.parquet`` / DuckDB.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql.streaming.listener import StreamingQueryListener


def write_alert_row(alerts_dir: str, row: dict) -> str:
    """Append one alert row as its own parquet file; returns the path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(alerts_dir, exist_ok=True)
    table = pa.table(
        {
            "alert_id": pa.array([row["alert_id"]], pa.string()),
            "query_name": pa.array([row["query_name"]], pa.string()),
            "query_id": pa.array([row["query_id"]], pa.string()),
            "run_id": pa.array([row["run_id"]], pa.string()),
            "error": pa.array([row["error"]], pa.string()),
            "alert_ts": pa.array([row["alert_ts"]], pa.timestamp("us", tz="UTC")),
        }
    )
    path = os.path.join(alerts_dir, f"alert-{row['alert_id']}.parquet")
    pq.write_table(table, path)
    return path


class FailureAlertListener(StreamingQueryListener):
    """Appends a quarantine row for every query that terminates WITH an
    exception; clean terminations write nothing. Register with
    ``spark.streams.addListener(listener)``."""

    def __init__(self, alerts_dir: str):
        self.alerts_dir = alerts_dir
        self.alerts_written: list[str] = []  # paths, for tests/inspection

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is None:
            return
        row = {
            "alert_id": uuid.uuid4().hex,
            "query_name": getattr(event, "name", None) or "",
            "query_id": str(event.id),
            "run_id": str(event.runId),
            "error": str(event.exception),
            "alert_ts": datetime.now(timezone.utc),
        }
        self.alerts_written.append(write_alert_row(self.alerts_dir, row))
