"""Date-partitioned gold layout: the watermark predicate must prune at the
file level (SURVEY.md §4 — we partition gold by date so the incremental
MAX(date) lower bound becomes partition pruning, not a full scan)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_expenses_spark.operators.merge import merge_append
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def gold():
    d = tempfile.mkdtemp(prefix="gold_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_partitioned_gold_prunes_watermark_scans(spark, gold):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    n = merge_append(orders, gold, keys=["o_orderkey"], partition_by=["order_month"])
    assert n == orders.count()

    table = spark.read.parquet(gold)
    one_month = table.filter(F.col("order_month") == "2000-03")

    # the month predicate must be a PARTITION filter (directory pruning),
    # never a data filter evaluated per row
    plan = _plan(one_month)
    partition_clause = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "order_month" in partition_clause
    # and it must NOT appear as a row-level data filter (the clause may be
    # absent entirely when partition pruning consumed the only predicate)
    if "PushedFilters" in plan:
        assert "order_month" not in plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    # correctness of the pruned read
    want = orders.filter(F.date_format("o_orderdate", "yyyy-MM") == "2000-03").count()
    assert one_month.count() == want


def test_partitioned_merge_stays_idempotent(spark, gold):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    first = orders.filter(F.col("o_orderkey") < 500)
    assert merge_append(first, gold, ["o_orderkey"], ["order_month"]) == first.count()
    # replay: zero new rows, table unchanged
    assert merge_append(first, gold, ["o_orderkey"], ["order_month"]) == 0
    assert spark.read.parquet(gold).count() == first.count()


def test_dynamic_partition_overwrite_restates_one_day(spark, gold):
    """Restating one date partition must leave every other partition's files
    untouched (partitionOverwriteMode=dynamic) — the batch 'reprocess one
    day' operation a 100 TB gold table needs; static mode would truncate
    the whole table."""
    gold = gold + "/table"
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.partitionBy("order_month").parquet(gold)
    before = spark.read.parquet(gold)
    n_total = before.count()
    n_march = before.filter(F.col("order_month") == "2000-03").count()
    assert 0 < n_march < n_total

    restated = (
        orders.filter(F.col("order_month") == "2000-03")
        .withColumn("o_orderpriority", F.lit("RESTATED"))
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("order_month")
        .parquet(gold)
    )
    after = spark.read.parquet(gold)
    assert after.count() == n_total  # other partitions intact
    assert (
        after.filter(F.col("order_month") == "2000-03")
        .filter(F.col("o_orderpriority") != "RESTATED")
        .count()
        == 0
    )
    assert (
        after.filter(F.col("order_month") != "2000-03")
        .filter(F.col("o_orderpriority") == "RESTATED")
        .count()
        == 0
    )


def test_zorder_layout_bounds_every_dimension_per_file(spark, gold):
    """Data-skipping proof from real parquet footers: under a one-dim sort
    each file spans ~the FULL range of the other dimension (a predicate on
    it prunes nothing); under the Z-order sort every file covers a bounded
    slice of the day dimension, so day predicates skip most files while
    cust predicates still prune via the leading interleave bits."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from etl_expenses_spark.functions.ids import zorder_key
    from etl_expenses_spark.sources.readers import load_table

    o = load_table(spark, SF_DIR, "orders")
    xb = (F.col("o_custkey") % 4096).cast("long")
    yb = (
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")) % 4096
    ).cast("long")
    base = o.select(
        xb.alias("cust_bucket"),
        yb.alias("day_bucket"),
        zorder_key(xb, yb, bits=12).alias("zkey"),
    )
    day_span_global = base.agg(
        (F.max("day_bucket") - F.min("day_bucket")).alias("s")
    ).first().s

    def day_spans(path_glob: str) -> list[int]:
        spans = []
        for f in glob.glob(path_glob):
            md = pq.read_metadata(f)
            lo = hi = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == "day_bucket" and col.statistics:
                        st = col.statistics
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
            spans.append(hi - lo)
        return spans

    zpath, onedim = f"{gold}/zsorted", f"{gold}/onedim"
    base.repartitionByRange(8, "zkey").sortWithinPartitions("zkey").write.parquet(zpath)
    base.repartitionByRange(8, "cust_bucket").sortWithinPartitions(
        "cust_bucket"
    ).write.parquet(onedim)

    z_spans = day_spans(f"{zpath}/part-*.parquet")
    c_spans = day_spans(f"{onedim}/part-*.parquet")
    # one-dim layout: no day pruning possible (every file ~spans the range)
    assert min(c_spans) > 0.9 * day_span_global, c_spans
    # z-order layout: every file bounded to a fraction of the day range
    assert max(z_spans) < 0.25 * day_span_global, z_spans


def test_write_zordered_api_round_trips_and_bounds_files(spark, gold):
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.layout import write_zordered
    from etl_expenses_spark.sources.readers import load_table

    o = load_table(spark, SF_DIR, "orders").withColumn(
        "order_day",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long"),
    )
    path = f"{gold}/zapi"
    write_zordered(o, path, ["o_custkey", "order_day"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == o.count()
    assert sorted(back.columns) == sorted(o.columns)  # __zkey not leaked
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.read_metadata(f)
        lo = hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == "order_day" and col.statistics:
                    st = col.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        spans.append(hi - lo)
    full = o.agg((F.max("order_day") - F.min("order_day")).alias("s")).first().s
    assert max(spans) < 0.25 * full, spans
