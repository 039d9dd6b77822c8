"""Physical table layout: multi-dimensional clustering for file skipping.

A 100 TB gold table answers predicates on several columns, but a file can
only be sorted one way. Z-ordering interleaves the bucketed dimensions into
one sort key so every written file covers a compact hyper-rectangle of the
value space — parquet min/max footer stats then prune files for predicates
on ANY clustered column (proof from real footers:
tests/test_partition_pruning.py::test_zorder_layout_bounds_every_dimension_per_file).

This is the open-source expression of what table formats call
Z-ORDER/CLUSTER BY; here it's plain Spark: bucket → interleave
(functions/ids.py:zorder_key) → repartitionByRange on the key (equal-sized
files, range-disjoint) → sortWithinPartitions → write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_expenses_spark.functions.ids import zorder_key


def _write_curve_keyed(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int,
    bits: int,
    mode: str,
    key_fn,
) -> None:
    """Shared body of the curve-keyed writers: bucket both dimensions into
    2^bits space (strings by hash; ints modulo — bucket-space locality is
    what the curve consumes), key with ``key_fn``, repartitionByRange for
    range-disjoint size-balanced files, sort within files so row-group
    stats tighten too."""
    if len(cluster_cols) != 2:
        raise ValueError("curve clustering here interleaves exactly 2 columns")
    a, b = cluster_cols
    mask = (1 << bits) - 1

    def bucket(c):
        return (
            F.abs(
                F.xxhash64(F.col(c))
                if df.schema[c].dataType.simpleString() == "string"
                else F.col(c).cast("long")
            )
            % (mask + 1)
        ).cast("long")

    keyed = df.withColumn("__ckey", key_fn(bucket(a), bucket(b), bits=bits))
    (
        keyed.repartitionByRange(n_files, "__ckey")
        .sortWithinPartitions("__ckey")
        .drop("__ckey")
        .write.mode(mode)
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on two columns via a Morton key.

    ``cluster_cols`` are bucketed modulo 2^bits (values need not be small —
    only locality within the bucket space matters). repartitionByRange gives
    range-disjoint, size-balanced files; the within-file sort tightens row-
    group stats too, so skipping works at row-group granularity as well.
    """
    _write_curve_keyed(df, path, cluster_cols, n_files, bits, mode, zorder_key)


def write_hilbert(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """``write_zordered`` with the Hilbert key (functions/ids.hilbert_key):
    the curve is continuous (no power-of-two jumps), so range-disjoint
    files cover tighter rectangles in (a, b) space — measurably smaller
    per-file min/max spans than the Morton key at identical sort cost
    (tests/test_lakehouse_hilbert.py)."""
    from etl_expenses_spark.functions.ids import hilbert_key

    _write_curve_keyed(df, path, cluster_cols, n_files, bits, mode, hilbert_key)


def write_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    sample_rows: int = 2000,
    mode: str = "overwrite",
) -> int:
    """Write parquet with files sized toward ``target_mb`` each — the
    chronic 100 TB hygiene task: too-small files bloat listings and footer
    reads; too-large files serialize task retries and kill scan
    parallelism granularity.

    Recipe: estimate bytes/row from a bounded driver-side sample (Spark
    rows → their parquet-ish size via the columns' serialized width is
    unknowable cheaply, so the sample is written through the SAME encoder:
    a one-file scratch write of ``sample_rows`` rows, measured on disk,
    then extrapolated), derive the file count, and repartition to it.
    Returns the number of files written. Compression ratios vary by data,
    which is exactly why the probe writes real parquet instead of trusting
    a constant."""
    import math
    import os
    import shutil
    import tempfile

    n = df.count()
    if n == 0:
        df.write.mode(mode).parquet(path)
        return 0
    probe_n = min(sample_rows, n)
    scratch = tempfile.mkdtemp(prefix="sizeprobe_")
    try:
        df.limit(probe_n).coalesce(1).write.mode("overwrite").parquet(scratch)
        probe_bytes = sum(
            os.path.getsize(os.path.join(scratch, f))
            for f in os.listdir(scratch)
            if f.endswith(".parquet")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    est_total = probe_bytes * (n / probe_n)
    n_files = max(1, math.ceil(est_total / (target_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode(mode).parquet(path)
    return n_files


def write_bloomed(
    df: DataFrame,
    path: str,
    bloom_cols: Sequence[str],
    expected_ndv: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Parquet write with per-column BLOOM FILTERS — the file-skipping
    lever for point lookups on HIGH-cardinality columns where min/max
    stats are useless (a uniformly distributed id spans every row group's
    min..max, so stat pruning keeps everything; a bloom filter answers
    "definitely not in this row group" probabilistically with no false
    negatives). Complements zorder (clusters value ranges) and the stats
    pruning pins in tests/test_pruning.py: zorder makes min/max work for
    a couple of correlated dims, blooms make equality work for the rest.

    At 100 TB: blooms cost O(ndv) bits per row group per column at write
    time and turn needle-in-haystack id lookups from full scans into a
    handful of row groups — parquet-mr's reader (which Spark's scans use)
    consults them during row-group filtering. Size `expected_ndv` to the
    per-row-group distinct count, not the global one."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = (
            w.option(f"parquet.bloom.filter.enabled#{c}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{c}", str(int(expected_ndv)))
        )
    w.parquet(path)
