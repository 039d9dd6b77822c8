"""JDBC source/sink surface (S8: remote SQL scan).

The reference reads its warehouse over the Redshift Data API and pages rows
through the driver (`redshift_to_bq/lambda_function.py:140-170` issues the
SELECT, then fetches result pages in a loop). The Spark-first form is
`spark.read.jdbc`: the query executes in the database, rows stream straight
into executors, and a partitioned read turns one remote scan into
`numPartitions` parallel range-bounded scans — the driver never touches row
data.

Scale notes (the parts that matter at 100 TB):

- ALWAYS pass a partition spec for big tables: `partition_col` must be an
  indexed, roughly-uniform numeric/date column; Spark issues one
  `WHERE col >= lo AND col < hi` query per partition. Without it the whole
  table arrives through ONE connection.
- Push the projection/predicate into `query` (or a `(SELECT …) AS t`
  dbtable) instead of filtering after the load — the database does the
  scan; Spark's own pushdown through JDBC covers simple filters but not
  aggregates (pre-aggregate in `query` when the result is what you need).
- `fetchsize` sizes the cursor batches (default 10 on some drivers — far
  too small; 10_000 is a sane floor).

No JDBC driver ships with this container; tests exercise the path end to
end against an embedded DuckDB over its JDBC driver when the jar is
present (tests/test_jdbc.py runs a subprocess session with
``spark.jars`` pointed at it) and skip otherwise.

Known dialect caveat: Spark has no DuckDB JdbcDialect, so
``JdbcUtils.tableExists`` cannot classify DuckDB's table-missing
SQLException (no SQLState) and rethrows it — create the target table
first (any client) and write with ``mode="append"``; reads are
unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    **options: str,
) -> DataFrame:
    """Read a table (or ``(SELECT …) AS t`` subquery) over JDBC.

    With ``partition_col`` + bounds, the scan is split into
    ``num_partitions`` range queries executed in parallel — the only shape
    that scales past one connection's throughput."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_col is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_col)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """Run ``query`` inside the database and stream the result set —
    projection, predicates, and aggregation all happen remotely; use this
    when the remote result (not the remote table) is the input."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    single_writer: bool = False,
    **options: str,
) -> None:
    """Write ``df`` to a JDBC table. One connection per partition;
    ``single_writer=True`` coalesces to one partition for engines that
    hold a single-writer lock (embedded DuckDB/SQLite)."""
    out = df.coalesce(1) if single_writer else df
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
