"""Spark-4 Python DataSource for Avro directories (sources/avro_source.py).

Pins the connector contract the oracle-checked query can't reach: date /
nullable-None / binary type mappings, per-partition file layout, overwrite
semantics, schema inference from the first header, empty-dir error.
"""

from __future__ import annotations

import datetime
import os

import pytest

from etl_expenses_spark.sources.avro_source import register


@pytest.fixture(scope="module")
def avro_spark(spark):
    try:
        register(spark)
    except Exception:
        pass
    return spark


def test_all_types_roundtrip(avro_spark, tmp_path):
    spark = avro_spark
    rows = [
        (1, "a", 1.5, True, b"\x00\xff", datetime.date(2024, 2, 29),
         datetime.datetime(2024, 2, 29, 12, 34, 56, 789012)),
        (2, None, -0.0, False, b"", datetime.date(1970, 1, 1),
         datetime.datetime(1969, 12, 31, 23, 59, 59)),
        (-(2**62), "üñí✓", 2.0**-1022, None, None, None, None),
    ]
    ddl = ("k bigint, s string, d double, b boolean, bin binary, "
           "dt date, ts timestamp")
    df = spark.createDataFrame(rows, ddl)
    target = str(tmp_path / "t")
    df.write.format("etl_avro").mode("overwrite").save(target)
    back = spark.read.format("etl_avro").load(target)
    assert back.schema == df.schema
    assert set(map(tuple, back.collect())) == set(map(tuple, df.collect()))


def test_one_file_per_partition_and_overwrite(avro_spark, tmp_path):
    spark = avro_spark
    target = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s")
    df.repartition(4).write.format("etl_avro").mode("overwrite").save(target)
    files = sorted(f for f in os.listdir(target) if f.endswith(".avro"))
    assert len(files) == 4
    # overwrite replaces the old part files entirely
    df.limit(10).repartition(1).write.format("etl_avro").mode(
        "overwrite"
    ).save(target)
    files = sorted(f for f in os.listdir(target) if f.endswith(".avro"))
    assert len(files) == 1
    assert spark.read.format("etl_avro").load(target).count() == 10


def test_schema_inference_matches_first_header(avro_spark, tmp_path):
    spark = avro_spark
    target = str(tmp_path / "t")
    spark.range(5).selectExpr(
        "id", "CAST(id AS DOUBLE) AS x", "id % 2 = 0 AS flag"
    ).write.format("etl_avro").mode("overwrite").save(target)
    back = spark.read.format("etl_avro").load(target)
    assert back.dtypes == [("id", "bigint"), ("x", "double"), ("flag", "boolean")]


def test_empty_dir_raises(avro_spark, tmp_path):
    spark = avro_spark
    os.makedirs(tmp_path / "empty", exist_ok=True)
    with pytest.raises(Exception, match="no .avro files"):
        spark.read.format("etl_avro").load(str(tmp_path / "empty")).count()
