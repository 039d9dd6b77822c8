"""Unit layer: the expression library against pandas/stdlib-computed
expectations (SURVEY.md §5 'our strategy')."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_expenses_spark.functions.dates import fix_two_digit_year, pad_time, to_date_dayfirst
from etl_expenses_spark.functions.ids import payment_id
from etl_expenses_spark.functions.money import currency_of, parse_money
from etl_expenses_spark.functions.text import lang_id, quality_score, token_count


def _col(spark, values, expr):
    df = spark.createDataFrame([Row(x=v) for v in values])
    return [r[0] for r in df.select(expr(F.col("x"))).collect()]


def test_parse_money_adversarial(spark):
    # the reference's parse_monto corpus (transform_data_bank_pay/lambda_function.py:9-20)
    # plus adversarial locale strings (SURVEY.md §7 'what's hard')
    cases = {
        "$1.234,56": 1234.56,
        "U$S 99,90": 99.90,
        "US$ 5": 5.0,
        "USD 1.000.000,00": 1000000.00,
        "AR$ 0,01": 0.01,
        "ARS$ 12": 12.0,
        "$12345": 12345.0,
        "  $ 7,50": None,  # '$ 7,50' — space between $ and digits is consumed
        "garbage": None,
    }
    out = _col(spark, list(cases), parse_money)
    for (s, want), got in zip(cases.items(), out):
        if s == "  $ 7,50":
            assert got is not None and float(got) == 7.50
        elif want is None:
            assert got is None, (s, got)
        else:
            assert got is not None and float(got) == want, (s, got)


def test_currency_of(spark):
    cases = {"U$S 9": "USD", "US$ 9": "USD", "USD 9": "USD", "$9": "ARS", "9": None}
    assert _col(spark, list(cases), currency_of) == list(cases.values())


def test_fix_two_digit_year_and_dayfirst(spark):
    cases = {
        "26/04/25": "26/04/2025",
        "26/04/2025": "26/04/2025",
        "1/2/99": "1/2/2099",
        "31/12/1999": "31/12/1999",
    }
    assert _col(spark, list(cases), fix_two_digit_year) == list(cases.values())
    dates = _col(spark, ["26/04/25", "1/2/2024"], to_date_dayfirst)
    assert [str(d) for d in dates] == ["2025-04-26", "2024-02-01"]


def test_pad_time(spark):
    assert _col(spark, ["19:44", "19:44:07", "9:44"], pad_time) == [
        "19:44:00",
        "19:44:07",
        "9:44",  # not length-5 → untouched, mirroring the reference guard
    ]


def test_payment_id_matches_reference_recipe(spark):
    # md5("{fecha}_{hora}_{monto}_{comercio}") — transform_data_bank_pay:53-54
    df = spark.createDataFrame(
        [Row(fecha="26/04/25", hora="19:44", monto="123.45", comercio="X")]
    )
    got = df.select(payment_id("fecha", "hora", "monto", "comercio")).collect()[0][0]
    assert got == hashlib.md5(b"26/04/25_19:44_123.45_X").hexdigest()


def test_token_count_and_lang_id(spark):
    assert _col(spark, ["a b  c", "  ", "one"], token_count) == [3, 0, 1]
    langs = _col(
        spark,
        ["the cat and the dog of a house", "el gato y la casa de un perro", "zzz qqq"],
        lang_id,
    )
    assert langs == ["en", "es", "unk"]


def test_quality_score_bounds(spark):
    vals = _col(spark, ["a good plain document with several words", "!!!,,,...", ""], quality_score)
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]


def test_sql_udfs_match_column_expressions(spark):
    """The SQL-surface functions (CREATE FUNCTION ... RETURN expr) must be
    behaviorally identical to the Column-expression library over the
    reference corpus + adversarial locale strings."""
    from etl_expenses_spark.functions.sql_udfs import register_sql_udfs

    register_sql_udfs(spark)
    strings = [
        "$1.234,56", "U$S 99,90", "US$ 5", "USD 1.000.000,00", "AR$ 0,01",
        "ARS$ 12", "$12345", "  $ 7,50", "garbage", "", None,
    ]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    df.createOrReplaceTempView("sqludf_cases")
    via_col = df.select(
        parse_money("s").alias("m"), currency_of("s").alias("c")
    ).collect()
    via_sql = spark.sql(
        "SELECT parse_money_sql(s) AS m, currency_of_sql(s) AS c FROM sqludf_cases"
    ).collect()
    assert [tuple(r) for r in via_col] == [tuple(r) for r in via_sql]

    dates = ["5/3/24", "05/03/2024", "1/1/99", "bad"]
    ddf = spark.createDataFrame([(d,) for d in dates], ["f"])
    ddf.createOrReplaceTempView("sqludf_dates")
    via_col = ddf.select(fix_two_digit_year("f").alias("x")).collect()
    via_sql = spark.sql(
        "SELECT fix_two_digit_year_sql(f) AS x FROM sqludf_dates"
    ).collect()
    assert [tuple(r) for r in via_col] == [tuple(r) for r in via_sql]


def test_zorder_key_interleave_roundtrip(spark):
    """The Morton key must be a bijection of (x, y): deinterleaving the
    emitted key in plain Python recovers both coordinates exactly."""
    from etl_expenses_spark.functions.ids import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 7, 255, 4095) for y in (0, 2, 9, 1024, 4095)],
        ["x", "y"],
    )
    rows = df.select("x", "y", zorder_key("x", "y", bits=12).alias("z")).collect()
    for r in rows:
        x = y = 0
        for i in range(12):
            x |= ((r.z >> (2 * i)) & 1) << i
            y |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r.x, r.y), (r.x, r.y, r.z)
