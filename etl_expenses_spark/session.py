"""SparkSession builder tuned for both local testing and cluster scale.

The confs below are chosen for the 100 TB design point and merely *sized*
for local runs:

- AQE on (runtime coalescing, skew-join splitting, join-strategy switching)
  — at cluster scale this is what keeps 1000-executor shuffles healthy when
  stats are stale; locally it coalesces tiny shuffles.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster you'd set ~2-3× total cores and let AQE coalesce down.
- Arrow enabled: every pandas-UDF boundary is Arrow-batched, never pickled
  rows.
- Session timezone pinned to UTC so date/window semantics are identical
  across engines (and match the DuckDB correctness oracle).
"""

# PROCESS GUARD: any behavioral edit to this file changes how EVERY query
# reads data — run the FULL-registry oracle sweep before committing
# (python tools/check_oracle.py /root/testdata/sf0.01 --vanilla); the
# round-2 json_struct_roundtrip wrong answer escaped exactly this way.

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_expenses_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    In local mode there is a single JVM; ``spark.driver.memory`` is the only
    memory knob. On a cluster the same conf set applies per executor.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Testdata parquet stores naive timestamps (isAdjustedToUTC=false);
        # Spark 4 would infer TIMESTAMP_NTZ, which epoch functions
        # (unix_millis/unix_micros) reject. With the session pinned to UTC,
        # reading them as TIMESTAMP is value-identical and matches DuckDB.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
