"""Custom Python data source (Spark 4 DataSource API): the webhook/REST
ingestion stage as a first-class, partitioned, restartable source.

The reference ingests via (a) a webhook dispatcher parsing POST bodies with
``files.{name,url,type}`` payloads (`/root/reference/webhook_mp_report/lambda_function.py:14-50`)
and (b) paginated REST list+get loops (S6,
`/root/reference/extract_data_mp/lambda_function.py:35-64`) — both
single-threaded driver-side Python in Lambda. Here the same fetch stage is a
``spark.read.format("webhook_events")`` source:

- ``partitions()`` splits the id space → every executor fetches its own
  page range in parallel (at 100 TB of backlog you raise ``parts``, not a
  single loop's timeout);
- the batch reader is deterministic per (partition, options) → retried
  tasks re-produce identical rows (Spark's task-retry contract);
- the streaming reader tracks a monotone id offset → exactly-once replay
  between checkpointed offsets, replacing the reference's "skip if key
  exists" compensation.

The payload generator is a deterministic stand-in for the network call (the
driver feeds no live HTTP here); swap ``_payload`` for a real ``requests``
call and the Spark-side contract is unchanged.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "webhook_id bigint, body string"


def _payload(i: int) -> tuple[int, str]:
    """Deterministic webhook POST body #i (the shape the dispatcher parses)."""
    ext = "csv" if i % 3 else "xlsx"
    body = {
        "transaction_id": (i * 7919) % 999983,
        "files": [
            {
                "name": f"settlement_{i}.{ext}",
                "type": f"application/{ext}",
                "url": f"https://example.invalid/reports/{i}",
            }
        ],
    }
    return i, json.dumps(body, separators=(",", ":"), sort_keys=True)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class WebhookEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        per = max(1, -(-self.rows // self.parts))
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _payload(i)


class WebhookEventsStreamReader(DataSourceStreamReader):
    """Monotone-offset stream: each micro-batch covers an id range; a range
    is re-readable from its offsets, so checkpoint replay is exact."""

    def __init__(self, options):
        self.batch = int(options.get("batch", 100))
        self.max_rows = int(options.get("rows", 1000))

    def initialOffset(self):
        return {"next": 0}

    def latestOffset(self):
        return {"next": self.max_rows}

    def partitions(self, start, end):
        return [_RangePartition(start["next"], end["next"])]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _payload(i)

    def commit(self, end):
        pass


class WebhookEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webhook_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> WebhookEventsReader:
        return WebhookEventsReader(self.options)

    def streamReader(self, schema) -> WebhookEventsStreamReader:
        return WebhookEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WebhookEventsDataSource)
