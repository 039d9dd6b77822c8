"""Lakehouse-layout operators: bucketed co-located joins, z-order
clustering, and small-file compaction planning.

These are the table-LAYOUT levers that decide whether a 100 TB join or
scan is cheap before a single task runs:

- **Bucketing** pre-shuffles a table once at write time (`bucketBy` on the
  join key). Two tables bucketed the same way join with ZERO Exchange —
  the per-round shuffle the reference's row-INSERT loads can never avoid
  (`load_data/lambda_function.py:16-36` re-sends every row over the wire;
  a bucketed columnar layout is its at-rest equivalent).
- **Z-ordering** interleaves the bits of several clustering keys into one
  sort key, so a range-sorted file layout gives min/max footer pruning on
  EVERY interleaved dimension at once (multi-column data skipping), not
  just the leading sort column.
- **Compaction planning** turns a small-file inventory into target-sized
  bins with the two-phase prefix-sum (operators/prefixsum.py) — running
  byte total `div` target size — so the plan itself never leaves the
  cluster (no driver-side file list walk, unlike S3 `list_objects_v2`
  loops in `transform_data_pdf/lambda_function.py:174-181`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_expenses_spark.operators.prefixsum import distributed_cumsum


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Bucket pruning + exchange elimination only engage when BOTH join sides
    use the same ``n_buckets`` on the join key; sorting within buckets
    additionally removes the sort step of a sort-merge join."""
    # A fresh session's in-memory catalog forgets managed tables while
    # their warehouse directories persist; saveAsTable then refuses with
    # LOCATION_ALREADY_EXISTS. A location without a catalog entry is by
    # definition stale here — clear it.
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, table.lower())
        if os.path.exists(loc):
            shutil.rmtree(loc)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket specs Spark
    plans a sort-merge join with NO ShuffleExchange on either side
    (pinned by tests/test_lakehouse.py) — at 100 TB this is the
    difference between a full network pass per join and none."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so one zero bit separates each data
    bit (0b1111 -> 0b01010101): the classic Morton-code bit dilation, done
    with shift/or/and masks only so the identical expression runs on any
    SQL engine (DuckDB oracle included)."""
    # long arithmetic throughout: with 32-bit ints the odd-position spread
    # (bit 15 -> 31) lands in the sign bit and wraps negative
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF).cast("long"))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zvalue2(a: Column, b: Column) -> Column:
    """Morton (Z-order) value interleaving the low 16 bits of two
    non-negative ints: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. Rows sorted by this one value are clustered in BOTH
    dimensions, so per-file min/max spans shrink on each column and the
    scan planner can skip files for predicates on either."""
    return _spread16(a) + F.shiftleft(_spread16(b), 1)


def zorder_layout(
    df: DataFrame, a: str, b: str, n_files: int = 16
) -> DataFrame:
    """Range-partition ``df`` by the z-value of (a, b) and sort within
    partitions — written out as-is, each output file covers a compact
    z-range, i.e. a small rectangle in (a, b) space.

    Both columns are min/max-normalized to the full 16-bit scale first
    (one broadcast row of bounds): raw interleaving only clusters fairly
    when the dimensions use equal bit widths — with, say, an 11-bit and a
    7-bit column, every top z-bit comes from the wide column and the file
    split never cuts on the narrow one."""
    bounds = df.agg(
        F.min(a).alias("__amin"),
        F.max(a).alias("__amax"),
        F.min(b).alias("__bmin"),
        F.max(b).alias("__bmax"),
    )

    def norm(c: str, lo: str, hi: str) -> Column:
        # long arithmetic + integral div: exact at any id magnitude
        return F.expr(f"(({c} - {lo}) * 65535) div greatest({hi} - {lo}, 1)")

    z = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "__z",
            zvalue2(
                norm(a, "__amin", "__amax"), norm(b, "__bmin", "__bmax")
            ),
        )
        .drop("__amin", "__amax", "__bmin", "__bmax")
    )
    return (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compaction_plan(
    files: DataFrame,
    size_col: str,
    order_col: str,
    target_bytes: int,
    bucket: Column,
) -> DataFrame:
    """Assign each file to a compaction bin of ~``target_bytes``: running
    byte total over the file order (two-phase distributed cumsum, bounded
    window partitions) integer-divided by the target. Consecutive files
    share a bin until it fills — the first-fit-in-order bin packing every
    table-maintenance service runs, with no driver-side loop.

    Returns the input plus ``bin`` (long); the rewrite step is then one
    ``repartition(n_bins, "bin")`` write per table."""
    cum = distributed_cumsum(files, order_col, size_col, bucket)
    return cum.withColumn(
        "bin", F.expr(f"(cum - {size_col}) div {int(target_bytes)}")
    ).drop("cum")
