"""Grid-cell geospatial join (operators/geo.py): completeness vs brute
force, boundary inclusion, cell-side contract, portable cell ids."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_expenses_spark.operators.geo import (
    pairs_within_radius,
    synth_lat,
    synth_lon,
    with_cell,
)


def _brute_pairs(a, b, r):
    out = set()
    for ka, la, xa in a:
        for kb, lb, xb in b:
            d2 = (la - lb) ** 2 + (xa - xb) ** 2
            if d2 <= r * r:
                out.add((ka, kb, d2))
    return out


def _df(spark, pts, key):
    return spark.createDataFrame(
        pts, f"{key} long, lat long, lon long"
    ).selectExpr(f"{key}", "lat", "lon")


def test_cell_join_matches_brute_force_random(spark):
    """The 3×3-neighborhood cell join finds EXACTLY the brute-force pair
    set — recall 1.0 (no pair missed across cell boundaries) and precision
    1.0 (the refine predicate removes same-cell far pairs)."""
    rng = random.Random(8)
    r = 1_000_000
    # cluster points at cell scale so cross-cell near pairs actually occur
    a = [
        (i, rng.randrange(-5_000_000, 5_000_000), rng.randrange(-5_000_000, 5_000_000))
        for i in range(120)
    ]
    b = [
        (i, rng.randrange(-5_000_000, 5_000_000), rng.randrange(-5_000_000, 5_000_000))
        for i in range(60)
    ]
    got = {
        (row.a_key, row.b_key, row.dist2)
        for row in pairs_within_radius(
            _df(spark, a, "a_key"), _df(spark, b, "b_key"), r
        ).collect()
    }
    assert got == _brute_pairs(a, b, r)
    assert got  # non-vacuous: the cluster produces matches


def test_cell_join_boundary_and_cross_cell_pairs(spark):
    """Planted adversarial cases: a pair exactly radius apart (included:
    <=), a pair 1 µdeg beyond (excluded), and a pair straddling a cell
    boundary at distance 2 (cross-cell, must be found)."""
    r = 1000
    a = [(1, 0, 0), (2, 0, 10_000), (3, 999, 2 * 1000 - 1)]
    #        (1) with b10 at exactly r   (2) far   (3) cross-boundary
    b = [(10, r, 0), (11, 0, 10_000 + r + 1), (12, 1000, 2 * 1000)]
    got = {
        (row.a_key, row.b_key)
        for row in pairs_within_radius(
            _df(spark, a, "a_key"), _df(spark, b, "b_key"), r
        ).collect()
    }
    assert (1, 10) in got  # dist == r inclusive
    assert (2, 11) not in got  # dist == r+1 excluded
    assert (3, 12) in got  # neighbors across the floor(coord/cell) boundary


def test_cell_side_must_cover_radius(spark):
    import pytest

    df = _df(spark, [(1, 0, 0)], "a_key")
    with pytest.raises(ValueError):
        pairs_within_radius(df, _df(spark, [(2, 0, 0)], "b_key"), 1000, cell=999)


def test_with_cell_matches_python_floor(spark):
    pts = [(-85_000_000, -180_000_000), (0, 0), (84_999_999, 179_999_999),
           (-1, -1), (12_345_678, -98_765_432)]
    df = spark.createDataFrame(pts, "lat long, lon long")
    rows = with_cell(df, 7_000_000).collect()
    for row in rows:
        assert row.cx == (row.lon + 180_000_000) // 7_000_000
        assert row.cy == (row.lat + 85_000_000) // 7_000_000


def test_synth_coords_in_range_and_deterministic(spark):
    df = spark.range(0, 500).select(
        synth_lat(F.col("id"), 1).alias("lat"),
        synth_lon(F.col("id"), 2).alias("lon"),
    )
    rows = df.collect()
    assert all(-85_000_000 <= r.lat <= 85_000_000 for r in rows)
    assert all(-180_000_000 <= r.lon <= 180_000_000 for r in rows)
    assert rows == df.collect()  # deterministic


def test_explicit_cell_zero_rejected(spark):
    """ADVICE r8: cell=0 must hit the ValueError, not be treated as unset."""
    import pytest

    df = _df(spark, [(1, 0, 0)], "a_key")
    with pytest.raises(ValueError):
        pairs_within_radius(df, _df(spark, [(2, 0, 0)], "b_key"), 1000, cell=0)


def test_missing_key_columns_rejected_up_front(spark):
    """ADVICE r8: the expected (key, lat, lon) columns are validated before
    any plan is built, with the side and the missing names in the error."""
    import pytest

    good = _df(spark, [(1, 0, 0)], "a_key")
    bad = _df(spark, [(2, 0, 0)], "wrong_key")
    with pytest.raises(ValueError, match="side 'b'.*b_key"):
        pairs_within_radius(good, bad, 1000)
    with pytest.raises(ValueError, match="side 'a'.*a_key"):
        pairs_within_radius(bad, good, 1000, a_key="a_key", b_key="wrong_key")
