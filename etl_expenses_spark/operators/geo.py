"""Grid-cell geospatial joins — the partition pattern for distance queries.

Reference parity: the reference has no geospatial surface (SURVEY.md §2 is
relational); this operator family serves the location joins a large-scale
pipeline runs over geotagged corpora (dedup by venue, POI conflation,
nearby-entity feature joins).

The 100 TB problem: "all pairs within radius r" is a cross join if written
naively — O(n·m) pairs shuffled for a result that is ~r²-sparse. The
standard scale pattern (used by every distributed geo engine: Sedona,
BigQuery GIS, PostGIS tiling) is GRID BUCKETING:

1. snap every point to a square cell of side = r (so any two points within
   distance r are in the same cell or one of its 8 neighbors — the
   3×3-neighborhood guarantee holds because cell ≥ r);
2. replicate ONE side (the smaller) into its 3×3 neighborhood — a 9×
   blow-up of the small relation, not the big one;
3. equi-join on cell id — an ordinary hash join Catalyst/AQE can
   broadcast, co-partition, or skew-split like any other join;
4. refine with the exact distance predicate inside the joined cell pairs.

Join cost collapses from |A|·|B| to Σ_cell |A_cell|·|B_cell±1| — linear in
the data for bounded point density, and every stage is a vanilla shuffle
Catalyst already knows how to plan. Degenerate density (everyone in one
city block) concentrates cells exactly like any hot join key, and the same
remedies apply (salt the hot cell, shrink the cell side and widen the
neighborhood to 5×5).

Coordinates are INTEGER MICRODEGREES (1e-6 deg) and the refine predicate is
the exact int64 squared planar distance dx²+dy² ≤ r² — engine-portable
(identical in Spark and any SQL oracle, no floating-point trig to diverge
in the last ulp). Planar distance on raw lat/lon is a documented
approximation (no cos(lat) shrink, no antimeridian wrap): these operators
demonstrate the distributed join geometry; swapping the refine expression
for haversine or a projected CRS does not change the plan shape.

max dx ≈ 3.6e8 µdeg → dx² ≈ 1.3e17 < 2⁶³: the refine arithmetic cannot
overflow int64 anywhere on the globe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash (same engine-portable int64-safe form as
# operators/graph.py): deterministic synthetic coordinates for tables that
# carry no real ones, identically computable by the SQL oracle.
_H_MOD = 1000003
_H_MUL = 2654435761
_H_SPACE = 4294967296

LAT_SPAN = 170_000_001  # [-85e6, +85e6] µdeg, poles excluded
LON_SPAN = 360_000_001  # [-180e6, +180e6] µdeg


def synth_lat(idcol: Column, salt: int) -> Column:
    """Deterministic latitude in µdeg from an integer key (int64-exact)."""
    h = (idcol % _H_MOD) * _H_MUL + F.lit(salt * 40503)
    return (h % _H_SPACE) % LAT_SPAN - F.lit(85_000_000)


def synth_lon(idcol: Column, salt: int) -> Column:
    """Deterministic longitude in µdeg from an integer key (int64-exact)."""
    h = (idcol % _H_MOD) * _H_MUL + F.lit(salt * 40503)
    return (h % _H_SPACE) % LON_SPAN - F.lit(180_000_000)


def with_cell(df: DataFrame, cell: int, lat="lat", lon="lon") -> DataFrame:
    """Snap points to square grid cells of side `cell` µdeg. floor-division
    on the non-negative shifted coordinate = identical cell ids in every
    engine (no negative-division disagreement)."""
    return df.withColumn(
        "cx", F.expr(f"({lon} + 180000000) div {int(cell)}")
    ).withColumn("cy", F.expr(f"({lat} + 85000000) div {int(cell)}"))


def pairs_within_radius(
    a: DataFrame,
    b: DataFrame,
    radius: int,
    cell: int | None = None,
    a_key: str = "a_key",
    b_key: str = "b_key",
) -> DataFrame:
    """All (a, b) point pairs with planar distance ≤ radius (µdeg), via the
    grid-cell equi-join — NEVER a cross join.

    `a` carries (`a_key`, lat, lon) and `b` carries (`b_key`, lat, lon);
    `b` should be the SMALLER relation — it is the side replicated into its
    3×3 cell neighborhood (9×|b| rows), after which the cell join is an
    ordinary equi-join AQE broadcasts when the replicated side fits.
    Output: (a_key, b_key, dist2) with dist2 = dx²+dy² ≤ radius² exact in
    int64.

    `cell` defaults to `radius` — the smallest side for which the 3×3
    neighborhood is a correctness guarantee (two points ≤ r apart differ by
    ≤ 1 in each floor(coord/cell) when cell ≥ r). An explicit cell=0 is
    rejected (ADVICE r8), not silently treated as unset."""
    for df, key, side in ((a, a_key, "a"), (b, b_key, "b")):
        missing = {key, "lat", "lon"} - set(df.columns)
        if missing:
            raise ValueError(
                f"pairs_within_radius: side '{side}' lacks column(s) "
                f"{sorted(missing)} (expected ({key}, lat, lon))"
            )
    cell = radius if cell is None else cell
    if cell < radius:
        raise ValueError("cell side must be >= radius for 3x3 completeness")
    an = with_cell(a, cell)
    bn = with_cell(b, cell)
    # replicate the small side into its 3x3 neighborhood
    off = F.expr(
        "explode(transform(sequence(0, 8), i -> "
        "struct(i div 3 - 1 AS ox, i % 3 - 1 AS oy)))"
    ).alias("o")
    bx = bn.select("*", off).select(
        F.col(b_key),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        (F.col("cx") + F.col("o.ox")).alias("cx"),
        (F.col("cy") + F.col("o.oy")).alias("cy"),
    )
    joined = an.join(bx, ["cx", "cy"])
    dist2 = (F.col("lat") - F.col("b_lat")) * (F.col("lat") - F.col("b_lat")) + (
        F.col("lon") - F.col("b_lon")
    ) * (F.col("lon") - F.col("b_lon"))
    return (
        joined.withColumn("dist2", dist2)
        # threshold precomputed in Python: radius² exceeds int32, and an
        # int32 lit*lit would overflow under ANSI constant folding
        .filter(F.col("dist2") <= F.lit(int(radius) * int(radius)))
        .select(a_key, b_key, "dist2")
    )
