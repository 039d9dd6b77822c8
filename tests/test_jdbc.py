"""S8 (remote SQL scan) exercised for REAL over JDBC.

The container has no network and no bundled JDBC driver, but a DuckDB JDBC
jar sits in the local coursier cache; when present, these tests launch a
fresh subprocess SparkSession with ``spark.jars`` pointed at it and
round-trip a table through `etl_expenses_spark.sources.jdbc` — write over
JDBC, read back whole, read back as a remote query, and read back as a
range-partitioned parallel scan. Skipped (not silently passed) when no
driver jar is available.

Reference analog: `redshift_to_bq/lambda_function.py:140-170` (Data API
SELECT + page loop) — here the database executes the query and rows stream
into executors with no driver-side paging.
"""

from __future__ import annotations

import glob
import subprocess
import sys
import textwrap

import pytest

_JARS = glob.glob(
    "/root/.cache/coursier/v1/**/duckdb_jdbc/**/duckdb_jdbc-*.jar", recursive=True
)


@pytest.mark.skipif(not _JARS, reason="no DuckDB JDBC driver jar in local caches")
def test_jdbc_roundtrip_whole_query_and_partitioned(tmp_path):
    jar = _JARS[0]
    db = tmp_path / "jdbc_test.db"
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession, functions as F
        from etl_expenses_spark.sources.jdbc import (
            read_jdbc_query, read_jdbc_table, write_jdbc_table,
        )

        url = "jdbc:duckdb:{db}"
        drv = "org.duckdb.DuckDBDriver"

        # Pre-create the target table with the (version-matched) Python
        # client: Spark's JdbcUtils.tableExists probe can't classify
        # DuckDB's "table does not exist" SQLException (no SQLState), so
        # it rethrows instead of returning false — creating the table
        # first sidesteps the probe. Close before the JVM connects
        # (embedded DuckDB is single-writer).
        import duckdb
        con = duckdb.connect("{db}")
        con.execute("CREATE TABLE t (id BIGINT, v BIGINT)")
        con.close()

        spark = (
            SparkSession.builder.master("local[4]")
            .config("spark.jars", "{jar}")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        df = spark.range(1000).select(
            F.col("id"), (F.col("id") * 3 % 7).alias("v")
        )
        # embedded DuckDB holds a single-writer lock -> one connection
        write_jdbc_table(df, url, "t", mode="append", driver=drv,
                         single_writer=True)

        back = read_jdbc_table(spark, url, "t", driver=drv)
        assert back.count() == 1000
        assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]

        # remote query execution: the DB aggregates, Spark sees 7 rows
        agg = read_jdbc_query(
            spark, url, "SELECT v, COUNT(*) AS n FROM t GROUP BY v", driver=drv
        )
        assert agg.count() == 7
        assert agg.agg(F.sum("n")).first()[0] == 1000

        # range-partitioned parallel scan: 4 bounded range queries
        part = read_jdbc_table(
            spark, url, "t", driver=drv,
            partition_col="id", lower_bound=0, upper_bound=1000,
            num_partitions=4,
        )
        assert part.rdd.getNumPartitions() == 4
        assert part.count() == 1000
        assert part.select("id").distinct().count() == 1000
        print("JDBC_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "JDBC_OK" in proc.stdout


@pytest.mark.skipif(not _JARS, reason="no DuckDB JDBC driver jar in local caches")
def test_jdbc_epoch_sink_exactly_once(tmp_path):
    """K-family closure over JDBC: the staged epoch-ledger sink is
    exactly-once under foreachBatch replay AND under a full re-run of the
    same availableNow stream with an intact checkpoint."""
    jar = _JARS[0]
    db = tmp_path / "wh.db"
    bronze = tmp_path / "bronze"
    ckpt = tmp_path / "ckpt"
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        import duckdb
        from pyspark.sql import SparkSession, functions as F
        from etl_expenses_spark.streaming.pipeline import (
            jdbc_epoch_sink, run_events_stream_to_jdbc,
        )

        url = "jdbc:duckdb:{db}"
        drv = "org.duckdb.DuckDBDriver"
        connect = lambda: duckdb.connect("{db}")

        spark = (
            SparkSession.builder.master("local[4]")
            .config("spark.jars", "{jar}")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

        # --- direct replay semantics: same epoch twice = one publish ---
        sink = jdbc_epoch_sink(url, "gold_direct", connect, driver=drv,
                               single_writer=True)
        b0 = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("v"))
        sink(b0, 0)
        sink(b0, 0)   # at-least-once replay after a crash-post-commit
        b1 = spark.range(100, 150).select(F.col("id"), (F.col("id") % 5).alias("v"))
        sink(b1, 1)
        con = connect()
        assert con.execute("SELECT COUNT(*) FROM gold_direct").fetchone()[0] == 150
        assert con.execute(
            "SELECT COUNT(DISTINCT id) FROM gold_direct").fetchone()[0] == 150
        assert con.execute(
            "SELECT COUNT(*) FROM gold_direct__epochs").fetchone()[0] == 2
        con.close()

        # --- end-to-end availableNow stream, run twice on one checkpoint ---
        src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        src.repartition(2).write.mode("append").parquet("{bronze}")
        n_src = src.count()
        for _ in range(2):   # second run: checkpoint says all files consumed
            run_events_stream_to_jdbc(
                spark, "{bronze}", url, "gold_stream", connect,
                "{ckpt}", driver=drv, single_writer=True)
        con = connect()
        assert con.execute("SELECT COUNT(*) FROM gold_stream").fetchone()[0] == n_src
        assert con.execute(
            "SELECT COUNT(DISTINCT event_id) FROM gold_stream").fetchone()[0] == n_src
        con.close()

        # --- task-retry duplication: Spark's JDBC writer commits per
        # PARTITION, so a task that dies after its commit re-appends its
        # whole partition into the stage. The r4 ADVICE hazard: the retry
        # may recompute the SAME multiset in a DIFFERENT row order, and the
        # payload may contain genuinely duplicated rows — a positional row
        # id would then publish a wrong multiset (A,A,B becomes A,B,B).
        # Simulate exactly that (partition re-appended in reversed order,
        # ids < 10 duplicated in the payload) and assert the published
        # multiset is exact.
        import etl_expenses_spark.sources.jdbc as _jdbc
        from pyspark.sql.functions import spark_partition_id
        _real_write = _jdbc.write_jdbc_table
        def _retry_write(df, url, table, **kw):
            _real_write(df, url, table, **kw)
            _real_write(df.where(spark_partition_id() == 0)
                          .orderBy(F.desc("id"), F.desc("_rid")),
                        url, table, **kw)
        _jdbc.write_jdbc_table = _retry_write
        try:
            retry_sink = jdbc_epoch_sink(url, "gold_retry", connect,
                                         driver=drv, single_writer=True)
            base = spark.range(80).select(
                F.col("id"), (F.col("id") % 3).alias("v"))
            dupes = spark.range(10).select(
                F.col("id"), (F.col("id") % 3).alias("v"))
            rb = base.unionAll(dupes).repartition(2)
            retry_sink(rb, 0)
        finally:
            _jdbc.write_jdbc_table = _real_write
        con = connect()
        assert con.execute("SELECT COUNT(*) FROM gold_retry").fetchone()[0] == 90
        assert con.execute(
            "SELECT COUNT(DISTINCT id) FROM gold_retry").fetchone()[0] == 80
        # exact multiset: ids < 10 appear exactly twice, the rest once
        assert con.execute(
            "SELECT COUNT(*) FROM (SELECT id FROM gold_retry "
            "GROUP BY id HAVING COUNT(*) = 2)").fetchone()[0] == 10
        con.close()
        print("JDBC_SINK_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "JDBC_SINK_OK" in proc.stdout
