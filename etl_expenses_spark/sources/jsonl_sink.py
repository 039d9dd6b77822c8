"""Custom Python data-sink (Spark 4 DataSource writer API): JSONL export
with write-stage-commit atomicity.

The reference's export sinks are driver-side loops: per-row INSERTs
(`/root/reference/load_data/lambda_function.py:17-36`) and a
whole-DataFrame CSV upload. This sink is the distributed, atomic form of
"push rows to an external consumer as JSON lines":

- every TASK stages its partition to ``<path>/_staging/<unique>.jsonl``
  and returns a commit message naming the staged file + row count;
- ``commit()`` (driver, exactly once) renames the staged files of the
  SUCCESSFUL attempts into place as ``part-NNNNN.jsonl``, writes a
  ``_SUCCESS`` manifest with the total row count, and sweeps any
  leftover staging garbage from failed/zombie attempts;
- ``abort()`` removes the staging dir — a failed job leaves the target
  exactly as it was (no partial visibility, the same WAP discipline as
  operators/wap.py).

Task retries are safe: each attempt stages under a fresh unique name, and
only the attempt whose commit message Spark delivers gets renamed in —
a retried task's orphan file is swept, never committed twice.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


def _default(o):
    """JSON fallback for non-native types (timestamps, dates, decimals,
    bytes): ISO/str text — the lossless-enough export form."""
    if isinstance(o, (bytes, bytearray)):
        return o.hex()
    return str(o)


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires .option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> JsonlCommit:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(name, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        row.asDict(recursive=True),
                        separators=(",", ":"),
                        sort_keys=True,
                        default=_default,
                    )
                )
                f.write("\n")
                n += 1
        return JsonlCommit(staged=name, rows=n)

    def commit(self, messages) -> None:
        staging = os.path.join(self.path, "_staging")
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") and f.startswith("part-"):
                    os.remove(os.path.join(self.path, f))
        existing = [
            f for f in os.listdir(self.path)
            if f.startswith("part-") and f.endswith(".jsonl")
        ]
        base = len(existing)  # append mode continues the part numbering
        total = 0
        committed = set()
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{base + i:05d}.jsonl")
            os.replace(m.staged, final)
            committed.add(m.staged)
            total += m.rows
        # sweep failed/zombie attempts' staging garbage
        if os.path.isdir(staging):
            for f in os.listdir(staging):
                os.remove(os.path.join(staging, f))
            os.rmdir(staging)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"rows": total, "files": len(messages)}, f)

    def abort(self, messages) -> None:
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            for f in os.listdir(staging):
                os.remove(os.path.join(staging, f))
            os.rmdir(staging)


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin of JsonlWriter (Spark 4 DataSourceStreamWriter):
    every micro-batch stages exactly like the batch sink, and ``commit``
    publishes under an EPOCH LEDGER — ``_batches.json`` records the
    committed batch ids, so a replayed epoch (foreachBatch-style replay
    after a crash, or a restart that re-delivers the last in-flight batch)
    drops its staged files instead of renaming a second copy in. Files are
    named ``part-<batch>-<i>.jsonl``; the ledger is replaced atomically
    (temp + os.replace), so a crash mid-commit is re-driven by the replay
    and never yields a half-published epoch the ledger claims is done."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires .option('path', ...)")

    def write(self, iterator: Iterator) -> JsonlCommit:
        return JsonlWriter({"path": self.path}, overwrite=False).write(iterator)

    def _ledger(self) -> dict:
        p = os.path.join(self.path, "_batches.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"committed": [], "rows": 0}

    def commit(self, messages, batchId: int) -> None:
        led = self._ledger()
        staging = os.path.join(self.path, "_staging")
        if int(batchId) in led["committed"]:
            # replayed epoch: the publish already happened — drop the
            # re-staged copies, never double-publish
            self.abort(messages, batchId)
            return
        # uncommitted epoch: a prior attempt may have crashed mid-rename,
        # leaving some part-<batchId>-*.jsonl already published. If this
        # replay produces FEWER files than the torn attempt renamed in, the
        # higher-index orphans would stay visible while the ledger's row
        # count excludes them (ADVICE r7) — so the replay first removes
        # every part file of the uncommitted epoch and fully replaces it.
        prefix = f"part-{int(batchId):05d}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix) and f.endswith(".jsonl"):
                os.remove(os.path.join(self.path, f))
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{int(batchId):05d}-{i:05d}.jsonl"
            )
            os.replace(m.staged, final)
            total += m.rows
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)
        led["committed"].append(int(batchId))
        led["rows"] += total
        tmp = os.path.join(self.path, "._batches.json.tmp")
        with open(tmp, "w") as f:
            json.dump(led, f)
        os.replace(tmp, os.path.join(self.path, "_batches.json"))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:  # pragma: no cover - writer-only source
        return "value string"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
