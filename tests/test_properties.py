"""Property-based tests (hypothesis) for the locale-sensitive expressions —
the "easy to silently corrupt" surfaces called out in SURVEY.md §7:
latam money strings, two-digit-year repair, time padding.

Each example materializes ONE small DataFrame and runs one Spark job, so
max_examples stays low; the per-example input is a generated *list* of
adversarial values, which is where the coverage comes from.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_expenses_spark.functions.dates import fix_two_digit_year, pad_time, to_date_dayfirst
from etl_expenses_spark.functions.money import currency_of, parse_money

SLOW = settings(max_examples=8, deadline=None)

amounts = st.decimals(
    min_value=Decimal("0.01"), max_value=Decimal("99999999.99"), places=2
)
prefixes = st.sampled_from(["U$S", "US$", "USD", "ARS$", "AR$", "$"])


def latam(amount: Decimal, prefix: str, thousands: bool) -> str:
    """Render a Decimal the way the reference's sources do: ',' decimal
    comma, optional '.' thousands separators, currency prefix."""
    intpart, frac = f"{amount:.2f}".split(".")
    if thousands:
        groups = []
        while intpart:
            groups.append(intpart[-3:])
            intpart = intpart[:-3]
        intpart = ".".join(reversed(groups))
    return f"{prefix} {intpart},{frac}"


@SLOW
@given(st.lists(st.tuples(amounts, prefixes, st.booleans()), min_size=1, max_size=30))
def test_parse_money_roundtrips_any_rendering(spark, cases):
    rows = [(latam(a, p, t), str(a)) for a, p, t in cases]
    df = spark.createDataFrame(rows, "raw string, want string")
    out = df.select(
        parse_money("raw").alias("got"), F.col("want").cast("decimal(12,2)").alias("want")
    ).collect()
    for r in out:
        assert r.got == r.want


@SLOW
@given(st.lists(st.tuples(amounts, prefixes, st.booleans()), min_size=1, max_size=30))
def test_currency_of_matches_prefix_family(spark, cases):
    rows = [(latam(a, p, t), "USD" if "U" in p.upper() else "ARS") for a, p, t in cases]
    df = spark.createDataFrame(rows, "raw string, want string")
    for r in df.select(currency_of("raw").alias("got"), "want").collect():
        assert r.got == r.want


@SLOW
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
        ),
        min_size=1,
        max_size=30,
    )
)
def test_parse_money_never_crashes_on_garbage(spark, junk):
    """Adversarial inputs: parse yields a decimal or NULL, never an error
    (the reference's silent-skip contract under ANSI-mode Spark)."""
    df = spark.createDataFrame([(j,) for j in junk], "raw string")
    df.select(parse_money("raw"), currency_of("raw")).collect()


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(1, 28), st.integers(1, 12), st.integers(0, 99), st.booleans()
        ),
        min_size=1,
        max_size=30,
    )
)
def test_two_digit_year_repair_and_dayfirst_parse(spark, dates):
    rows = []
    for d, m, y2, two in dates:
        if two:
            rows.append((f"{d:02d}/{m:02d}/{y2:02d}", f"20{y2:02d}-{m:02d}-{d:02d}"))
        else:
            rows.append((f"{d:02d}/{m:02d}/20{y2:02d}", f"20{y2:02d}-{m:02d}-{d:02d}"))
    df = spark.createDataFrame(rows, "raw string, want string")
    out = df.select(
        to_date_dayfirst("raw").alias("got"), F.col("want").cast("date").alias("want")
    ).collect()
    for r in out:
        assert r.got == r.want


@SLOW
@given(st.lists(st.tuples(st.integers(0, 23), st.integers(0, 59)), min_size=1, max_size=30))
def test_pad_time_always_hhmmss(spark, times):
    rows = [(f"{h:02d}:{m:02d}",) for h, m in times]
    df = spark.createDataFrame(rows, "raw string")
    for r in df.select(pad_time("raw").alias("got")).collect():
        assert len(r.got) == 8 and r.got.endswith(":00")


def test_fix_two_digit_year_passthrough_non_dates(spark):
    df = spark.createDataFrame([("garbage",), ("1/2",), ("",)], "raw string")
    got = [r.out for r in df.select(fix_two_digit_year("raw").alias("out")).collect()]
    assert got == ["garbage", "1/2", ""]


# --- bucketed range join ≡ naive non-equi join, on arbitrary event sets ---

ts_micros = st.integers(
    min_value=1_700_000_000_000_000, max_value=1_700_000_600_000_000  # a 10-min span
)
event_rows = st.lists(
    st.tuples(st.integers(0, 4), ts_micros),  # (user_id, ts)
    min_size=0,
    max_size=40,
)


@SLOW
@given(left_rows=event_rows, right_rows=event_rows, window_s=st.sampled_from([7, 60, 301]))
def test_bucketed_interval_join_equals_naive_on_random_sets(
    spark, left_rows, right_rows, window_s
):
    """For ANY point sets and window width (including windows that straddle
    bucket boundaries and zero-size sides), the bucketed rewrite must
    produce exactly the naive non-equi join's pair set."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_expenses_spark.operators.rangejoin import bucketed_interval_pairs

    schema_l = T.StructType(
        [T.StructField("lid", T.LongType()), T.StructField("luser", T.LongType()),
         T.StructField("lts", T.TimestampType())]
    )
    schema_r = T.StructType(
        [T.StructField("rid", T.LongType()), T.StructField("ruser", T.LongType()),
         T.StructField("rts", T.TimestampType())]
    )
    import datetime as dt

    mk = lambda us: dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(  # noqa: E731
        tzinfo=None
    )
    left = spark.createDataFrame(
        [(i, u, mk(t)) for i, (u, t) in enumerate(left_rows)], schema_l
    )
    right = spark.createDataFrame(
        [(i, u, mk(t)) for i, (u, t) in enumerate(right_rows)], schema_r
    )
    fast = {
        (r.lid, r.rid)
        for r in bucketed_interval_pairs(
            left, right, "luser", "ruser", "lts", "rts", window_s=window_s
        ).collect()
    }
    naive = {
        (r.lid, r.rid)
        for r in left.join(
            right,
            (F.col("ruser") == F.col("luser"))
            & (F.col("rts") > F.col("lts") - F.expr(f"INTERVAL {window_s} SECONDS"))
            & (F.col("rts") <= F.col("lts")),
            "inner",
        ).collect()
    }
    assert fast == naive


# ---------------------------------------------------------------------------
# Codec roundtrips: the pure-Python PDF and XLSX readers must invert their
# test writers for arbitrary content — escapes, unicode (latin-1 plane for
# PDF simple fonts), shared-string dedup, mixed cell types.
# ---------------------------------------------------------------------------

# exclude \x7f and \x85 (NEL): str.splitlines treats NEL as a line break,
# so the writer legitimately splits it — not a roundtrip violation
_pdf_line = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0xFF, exclude_characters="\x7f\x85"
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_pdf_line, min_size=1, max_size=8), min_size=1, max_size=3))
def test_pdf_writer_reader_roundtrip(pages):
    from etl_expenses_spark.pdftext import extract_text, make_pdf

    rendered = pages
    pdf = make_pdf(["\n".join(page) for page in rendered], compress=True)
    got = extract_text(pdf)
    got_lines = got.splitlines()
    for page in rendered:
        for line in page:
            if line.strip():
                assert line in got_lines, (line, got_lines[:10])


_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
        max_size=24,
    ),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=10))
def test_xlsx_writer_reader_roundtrip(rows):
    from etl_expenses_spark.sources.xlsx import make_xlsx, read_xlsx

    width = max(len(r) for r in rows)
    padded = [r + [None] * (width - len(r)) for r in rows]
    got = read_xlsx(make_xlsx(padded))
    assert len(got) == len(padded)
    for want_row, got_row in zip(padded, got):
        for want, g in zip(want_row, got_row):
            if want is None:
                assert g is None
            elif isinstance(want, bool):
                assert g is want
            elif isinstance(want, str):
                assert g == want
            elif isinstance(want, int):
                assert g == want
            else:
                assert g == pytest.approx(float(want), rel=0, abs=0) or g == float(want)


@given(
    data=st.lists(
        st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64),
        min_size=1,
        max_size=8,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_any_pcm(data, rate):
    """Pure-codec property: ANY int16 sample block survives
    encode_wav→decode_wav bit-exactly at any channel count / rate."""
    import numpy as np

    from etl_expenses_spark.operators.audiocodec import decode_wav, encode_wav

    samples = np.asarray(data, dtype=np.int16).T  # (n_samples, n_channels)
    decoded = decode_wav(encode_wav(samples, rate))
    assert decoded is not None
    out, r = decoded
    assert r == rate and np.array_equal(out, samples)


@given(
    shape=st.tuples(
        st.integers(min_value=1, max_value=6),   # frames
        st.integers(min_value=1, max_value=16),  # height
        st.integers(min_value=1, max_value=16),  # width
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    chroma=st.sampled_from([b"420", b"422", b"444", b"mono"]),
)
@settings(max_examples=50, deadline=None)
def test_y4m_roundtrip_any_luma(shape, seed, chroma):
    """Pure-codec property: ANY uint8 luma stack survives
    encode_y4m→decode_y4m bit-exactly in every supported colorspace.
    (Odd dims: chroma plane sizes floor-divide, matching ffmpeg.)"""
    import numpy as np

    from etl_expenses_spark.operators.videocodec import decode_y4m, encode_y4m

    frames = np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)
    decoded = decode_y4m(encode_y4m(frames, chroma=chroma))
    assert decoded is not None
    stack, w, h = decoded
    assert (w, h) == (shape[2], shape[1])
    assert np.array_equal(stack, frames)


# --------------------------------------------------------------------------
# Distributed prefix-sum family vs a plain-Python reference on random data:
# the two-phase scan must equal the sequential cumsum for ANY weights and
# ANY bucket granularity, and the PPS walk must select exactly the rows
# whose weight interval covers a step multiple.
# --------------------------------------------------------------------------
weights = st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=60)


@SLOW
@given(weights, st.integers(min_value=1, max_value=16))
def test_distributed_cumsum_equals_sequential(spark, ws, bucket_width):
    from etl_expenses_spark.operators.prefixsum import distributed_cumsum

    rows = [(i, w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(rows, "k long, w long").repartition(4)
    got = {
        r.k: r.cum
        for r in distributed_cumsum(
            df, "k", "w", bucket=F.expr(f"k div {bucket_width}")
        ).collect()
    }
    acc, want = 0, {}
    for i, w in enumerate(ws):
        acc += w
        want[i] = acc
    assert got == want


@SLOW
@given(weights, st.integers(min_value=1, max_value=20))
def test_pps_sample_matches_sequential_walk(spark, ws, k):
    from etl_expenses_spark.operators.prefixsum import pps_sample

    rows = [(i, w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(rows, "k long, w long").repartition(3)
    got = {
        (r.k, r.n_picks)
        for r in pps_sample(df, "k", "w", k=k, bucket=F.expr("k div 8")).collect()
    }
    total = sum(ws)
    step = max(1, total // k)
    acc, want = 0, set()
    for i, w in enumerate(ws):
        lo, acc = acc, acc + w
        picks = acc // step - lo // step
        if picks >= 1:
            want.add((i, picks))
    assert got == want
