"""Schema coercion, inference cascade, and header-dialect normalization
(quality.py — reference `redshift_to_bq/lambda_function.py:38-131` and
`load_data/lambda_function.py:76-159`)."""

import pytest

from etl_expenses_spark.quality import (
    apply_dtype_map,
    infer_and_cast,
    normalize_columns,
    require_fields,
)


def test_apply_dtype_map_try_cast_nulls_bad_values(spark):
    df = spark.createDataFrame([("1", "x"), ("oops", "y")], "a string, b string")
    out = apply_dtype_map(df, {"a": "long"})
    assert out.schema["a"].dataType.simpleString() == "bigint"
    assert [r.a for r in out.orderBy("b").collect()] == [1, None]


def test_infer_cascade_long_double_timestamp_string(spark):
    df = spark.createDataFrame(
        [("1", "1.5", "2024-01-02 03:04:05", "abc")],
        "i string, d string, t string, s string",
    )
    out = infer_and_cast(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "double",
        "timestamp",
        "string",
    ]


def test_infer_cascade_mixed_column_stays_string(spark):
    df = spark.createDataFrame([("1",), ("x",)], "a string")
    assert infer_and_cast(df).schema["a"].dataType.simpleString() == "string"


def test_normalize_columns_detects_dialect(spark):
    dialects = [{"A": "a", "B": "b"}, {"alfa": "a", "beta": "b"}]
    es = spark.createDataFrame([(1, 2)], "alfa long, beta long")
    assert normalize_columns(es, dialects).columns == ["a", "b"]
    en = spark.createDataFrame([(1, 2, 9)], "A long, B long, extra long")
    assert normalize_columns(en, dialects).columns == ["a", "b", "extra"]


def test_normalize_columns_unknown_dialect_raises(spark):
    df = spark.createDataFrame([(1,)], "mystery long")
    with pytest.raises(ValueError, match="no header dialect"):
        normalize_columns(df, [{"A": "a"}])


def test_require_fields_drops_incomplete_rows(spark):
    df = spark.createDataFrame([("x", 1), (None, 2)], "k string, v long")
    assert require_fields(df, ["k"]).count() == 1
