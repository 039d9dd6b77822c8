"""Input fan-out for CPU-dense per-row stages (optimization guide §2.5/§4).

The problem this solves is input-parallelism starvation, not data volume:
a narrow scan — locally a single small parquet file with one row group, at
cluster scale one shard of a CDC delta or one unsplittable object — feeds a
compute-bound stage (text hashing, codec encode/decode, vector math) whose
per-row cost is thousands of cycles. Spark sizes scan partitions by BYTES
(``spark.sql.files.maxPartitionBytes``), so a few-MB input plans as ONE
task and the stage serializes on one core while the rest of the executor
sits idle (measured at sf0.1: the Avro codec ran 1.9 s on one task of a
32-core session; the MinHash signature stage 1.1 s on one task).

``fan_out`` hash-repartitions such an input up to the session's default
parallelism — and only UP: an input that already plans at or above the
session's parallelism (the 100 TB steady state) is returned untouched, so
this is never a coalesce and never adds an exchange where the scan is
already wide. The repartition is keyed (hash of the caller's id column),
not round-robin: deterministic row placement under task retry (no
sort-before-repartition pass, no SPARK-38388-class concerns).

Cost when it fires: one exchange of the narrow input (KBs..MBs here — the
payload columns selected by the caller, nothing more). The call sites are
exactly the stages a profile showed serializing on task-starved inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Planned-partition-count cache (r14, VERDICT r13 #6): probing a frame's
# partition count forces a physical-planning pass of its plan at build
# time, on EVERY invocation — pure driver overhead that grows with plan
# complexity. The count is a deterministic function of (session, logical
# plan): for the scan-derived frames every call site passes, it is fixed
# by the file listing and split size for the life of the session, so the
# SECOND and later builds of the same query can reuse the first build's
# probe. Keyed by the canonicalized plan's semanticHash (JVM-side, no
# physical planning); checkpointed/cached leaves hash per-instance, so
# they simply miss and re-probe. Bounded: cleared wholesale if it ever
# grows past _PROBE_CACHE_MAX (sessions here build a few hundred distinct
# plans at most).
_PROBE_CACHE: dict[tuple[str, int], int] = {}
_PROBE_CACHE_MAX = 1024


def _planned_partitions(df: DataFrame) -> int:
    """``df``'s physical partition count, memoized per (session, plan).

    Uses ``QueryExecution.toRdd`` via py4j — the internal row RDD, no
    Python-serializer wrapper like ``df.rdd`` — and falls back to the
    public path when JVM internals are unavailable (Spark Connect)."""
    jdf = getattr(df, "_jdf", None)
    if jdf is None:  # Spark Connect: no internals, no cheap cache key
        return df.rdd.getNumPartitions()
    qe = jdf.queryExecution()
    key = (df.sparkSession.sparkContext.applicationId, qe.analyzed().semanticHash())
    n = _PROBE_CACHE.get(key)
    if n is None:
        n = qe.toRdd().getNumPartitions()
        if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.clear()
        _PROBE_CACHE[key] = n
    return n


def fan_out(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Raise ``df``'s partition count to the session's default parallelism
    when it plans below that; identity otherwise (never lowers parallelism,
    passes streaming frames through untouched)."""
    if df.isStreaming:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    if _planned_partitions(df) >= n:
        return df
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.repartition(n, *cols) if cols else df.repartition(n)
