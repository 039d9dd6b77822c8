"""Skyline two-phase correctness vs brute-force dominance on random points
(ties included — the RANGE/equal-price window split is the part worth
hammering)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_expenses_spark.plans.relational_ext import _skyline_2d_pass


def brute_skyline(pts):
    out = []
    for i, (k, c, d) in enumerate(pts):
        dominated = any(
            (c2 <= c and d2 >= d and (c2 < c or d2 > d))
            for j, (k2, c2, d2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((k, c, d))
    return sorted(out)


def test_two_phase_skyline_matches_bruteforce_with_ties(spark):
    rng = random.Random(11)
    # small value domains force price ties, date ties, and full duplicates
    pts = [(k, rng.randrange(12), rng.randrange(12)) for k in range(300)]
    df = spark.createDataFrame(pts, "o_orderkey long, cents long, odate long")
    local = _skyline_2d_pass(
        df.repartition(7).withColumn("pid", F.spark_partition_id()), "pid"
    ).drop("pid")
    got = sorted(
        tuple(r)
        for r in _skyline_2d_pass(local.withColumn("pid", F.lit(0)), "pid")
        .drop("pid")
        .collect()
    )
    assert got == brute_skyline(pts)
    assert got  # non-vacuous


def test_full_duplicates_all_survive(spark):
    """Duplicate points do not dominate each other (no strict edge):
    every copy belongs to the skyline."""
    pts = [(1, 5, 5), (2, 5, 5), (3, 9, 9), (4, 9, 9)]
    df = spark.createDataFrame(pts, "o_orderkey long, cents long, odate long")
    got = sorted(
        tuple(r)
        for r in _skyline_2d_pass(df.withColumn("pid", F.lit(0)), "pid")
        .drop("pid")
        .collect()
    )
    # (9,9) dominates (5,5) is false: 9 > 5 on cents (worse). (5,5) vs
    # (9,9): cents 5<=9 ok but odate 5>=9 fails — nobody dominates anybody
    assert got == sorted(pts)


def brute_skyline_3d(pts):
    out = []
    for i, (k, c, o, q) in enumerate(pts):
        dominated = any(
            (c2 <= c and o2 >= o and q2 >= q and (c2 < c or o2 > o or q2 > q))
            for j, (k2, c2, o2, q2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((k, c, o, q))
    return sorted(out)


def test_3d_two_phase_matches_bruteforce_with_ties(spark):
    """The 3D SFS + broadcast-merge pipeline vs brute-force dominance on
    random points with tiny value domains (heavy ties on every dim,
    full duplicates included)."""
    from etl_expenses_spark.plans.relational_ext import _skyline_3d

    rng = random.Random(23)
    pts = [
        (k, rng.randrange(8), rng.randrange(8), rng.randrange(8))
        for k in range(400)
    ]
    df = spark.createDataFrame(
        pts, "o_orderkey long, cents long, osec long, qty long"
    )
    got = sorted(tuple(r) for r in _skyline_3d(df, spark).collect())
    assert got == brute_skyline_3d(pts)
    assert got


def test_3d_full_duplicates_all_survive(spark):
    from etl_expenses_spark.plans.relational_ext import _skyline_3d

    pts = [(1, 5, 5, 5), (2, 5, 5, 5), (3, 5, 5, 5)]
    df = spark.createDataFrame(
        pts, "o_orderkey long, cents long, osec long, qty long"
    )
    got = sorted(tuple(r) for r in _skyline_3d(df, spark).collect())
    assert got == sorted(pts)  # no strict edge between identical points


def test_insert_maintenance_equals_recompute_random_splits(spark):
    """skyline(skyline(A) ∪ B) == skyline(A ∪ B) for random 2D point sets
    under several random base/delta splits — the transitivity identity the
    skyline_insert_maintenance query rests on."""
    rng = random.Random(7)
    pts = [(k, rng.randrange(10), rng.randrange(10)) for k in range(240)]

    def spark_skyline(rows):
        df = spark.createDataFrame(
            rows, "o_orderkey long, cents long, odate long"
        )
        local = _skyline_2d_pass(
            df.repartition(5).withColumn("pid", F.spark_partition_id()), "pid"
        ).drop("pid")
        return sorted(
            tuple(r)
            for r in _skyline_2d_pass(local.withColumn("pid", F.lit(0)), "pid")
            .drop("pid")
            .collect()
        )

    full = spark_skyline(pts)
    for cut in (0.2, 0.5, 0.8):
        split = int(len(pts) * cut)
        base, delta = pts[:split], pts[split:]
        view = spark_skyline(base)  # the stored skyline view
        maintained = spark_skyline(list(view) + delta)
        assert maintained == full, f"cut={cut}"


def test_layered_view_delete_maintenance_equals_recompute(spark):
    """VERDICT r10 #4: the kband-layer onion view supports up to kband-1
    deletions exactly — sweeping (view \\ D) ∪ delta equals a full
    recompute over (base \\ D) ∪ delta, including when D hits skyline
    points whose successors must resurrect from deeper layers. Hammered
    on random tied points with D = the current champions (worst case)."""
    rng = random.Random(23)
    kband = 3
    for trial in range(4):
        pts = [(k, rng.randrange(10), rng.randrange(10)) for k in range(200)]
        base, delta = pts[:150], pts[150:]
        df = spark.createDataFrame(
            base, "o_orderkey long, cents long, odate long"
        )

        def two_phase(p):
            local = _skyline_2d_pass(
                p.repartition(5).withColumn("pid", F.spark_partition_id()),
                "pid",
            ).drop("pid")
            return _skyline_2d_pass(
                local.withColumn("pid", F.lit(0)), "pid"
            ).drop("pid")

        layers, remaining = [], df
        for _ in range(kband):
            lay = two_phase(remaining).persist()
            layers.append(lay)
            remaining = remaining.join(
                lay.select("o_orderkey"), "o_orderkey", "left_anti"
            )
        view = layers[0]
        for lay in layers[1:]:
            view = view.unionByName(lay)
        # D = the kband-1 champions of the current skyline (all guaranteed
        # skyline members -> maximal resurrection pressure)
        d_ids = [
            r.o_orderkey
            for r in layers[0].orderBy("cents", "o_orderkey").limit(kband - 1).collect()
        ]
        delta_df = spark.createDataFrame(
            delta, "o_orderkey long, cents long, odate long"
        )
        got = sorted(
            tuple(r)
            for r in two_phase(
                view.filter(~F.col("o_orderkey").isin(d_ids)).unionByName(
                    delta_df
                )
            ).collect()
        )
        live = [p for p in pts if p[0] not in set(d_ids)]
        assert got == brute_skyline(live), f"trial {trial}"
        for lay in layers:
            lay.unpersist()
