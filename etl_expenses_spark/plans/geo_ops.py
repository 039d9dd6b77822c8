"""Geospatial queries — grid-cell distance joins over synthetic coordinates.

The reference engine has no geospatial surface (its §2 scope is
relational); this family adds the location ops a large-scale curation
pipeline runs over geotagged data, built on operators/geo.py's grid-cell
join — the canonical "never cross join" distance pattern.

Coordinates are deterministic integer microdegrees derived from the keys by
the same engine-portable Knuth hash the graph operators use, so the DuckDB
oracle reproduces them bit-exactly — and, because the oracle side computes
the result by BRUTE-FORCE cross join + the identical exact distance
predicate, every green row doubles as an independent proof that the cell
scheme's 3×3 neighborhood finds ALL pairs (recall 1.0), not just the ones
that happen to share a cell.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_expenses_spark.plans._util import T
from etl_expenses_spark.plans.registry import query

# SQL fragments for the oracle twin of operators/geo.py's synth coords.
# DuckDB's % on the non-negative operands here is the same mod Spark
# computes; every intermediate stays far below int64.
_LAT = (
    "(((({k} % 1000003) * 2654435761 + {salt} * 40503) % 4294967296)"
    " % 170000001 - 85000000)"
)
_LON = (
    "(((({k} % 1000003) * 2654435761 + {salt} * 40503) % 4294967296)"
    " % 360000001 - 180000000)"
)


def _points(df, key: str, lat_salt: int, lon_salt: int, out_key: str):
    from etl_expenses_spark.operators.geo import synth_lat, synth_lon

    return df.select(
        F.col(key).alias(out_key),
        synth_lat(F.col(key), lat_salt).alias("lat"),
        synth_lon(F.col(key), lon_salt).alias("lon"),
    )


_PAIR_RADIUS = 2_000_000  # 2 deg in µdeg
_KNN_RADIUS = 8_000_000


@query(
    "geo_cell_join_nearby_pairs",
    oracle=f"""
        WITH c AS (
            SELECT c_custkey,
                   {_LAT.format(k="c_custkey", salt=1)} AS lat,
                   {_LON.format(k="c_custkey", salt=2)} AS lon
            FROM customer),
        s AS (
            SELECT s_suppkey,
                   {_LAT.format(k="s_suppkey", salt=3)} AS lat,
                   {_LON.format(k="s_suppkey", salt=4)} AS lon
            FROM supplier),
        pairs AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.lat - s.lat) * (c.lat - s.lat)
                 + (c.lon - s.lon) * (c.lon - s.lon) AS dist2
            FROM c CROSS JOIN s)
        SELECT c_custkey, s_suppkey, CAST(dist2 AS BIGINT) AS dist2
        FROM pairs
        WHERE dist2 <= {_PAIR_RADIUS}::BIGINT * {_PAIR_RADIUS}
    """,
    tags=("geo", "join", "spatial"),
)
def geo_cell_join_nearby_pairs(spark, sf_dir):
    """Every (customer, supplier) point pair within 2° planar distance, via
    the grid-cell equi-join (operators/geo.py pairs_within_radius): snap to
    radius-sized cells, replicate the SMALL side into its 3×3 neighborhood,
    hash-join on cell id, refine with the exact int64 dx²+dy² predicate.

    The oracle is the brute-force cross join with the identical predicate,
    so a green row proves the cell join's completeness (the 3×3 guarantee),
    not just its precision.

    100 TB shape: the naive form is an |A|·|B| cross join; this plan's join
    is an ordinary equi-join on cell id costing Σ_cell |A_c|·|B_c±1| —
    linear for bounded point density — whose replicated side is 9×|B|
    (the small relation), broadcast by AQE when it fits. Hot cells (a city
    block at 100 TB) concentrate like any hot join key and take the same
    remedies (salt the cell, shrink the side + widen the neighborhood)."""
    from etl_expenses_spark.operators.geo import pairs_within_radius

    cust = _points(T(spark, sf_dir, "customer"), "c_custkey", 1, 2, "a_key")
    supp = _points(T(spark, sf_dir, "supplier"), "s_suppkey", 3, 4, "b_key")
    return pairs_within_radius(cust, supp, _PAIR_RADIUS).select(
        F.col("a_key").alias("c_custkey"),
        F.col("b_key").alias("s_suppkey"),
        F.col("dist2"),
    )


@query(
    "geo_knn_nearest_suppliers",
    oracle=f"""
        WITH c AS (
            SELECT c_custkey,
                   {_LAT.format(k="c_custkey", salt=1)} AS lat,
                   {_LON.format(k="c_custkey", salt=2)} AS lon
            FROM customer),
        s AS (
            SELECT s_suppkey,
                   {_LAT.format(k="s_suppkey", salt=3)} AS lat,
                   {_LON.format(k="s_suppkey", salt=4)} AS lon
            FROM supplier),
        pairs AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.lat - s.lat) * (c.lat - s.lat)
                 + (c.lon - s.lon) * (c.lon - s.lon) AS dist2
            FROM c CROSS JOIN s),
        ranked AS (
            SELECT c_custkey, s_suppkey, dist2,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_custkey
                       ORDER BY dist2, s_suppkey) AS rk
            FROM pairs
            WHERE dist2 <= {_KNN_RADIUS}::BIGINT * {_KNN_RADIUS})
        SELECT c_custkey, CAST(rk AS INT) AS rk, s_suppkey,
               CAST(dist2 AS BIGINT) AS dist2
        FROM ranked WHERE rk <= 3
    """,
    tags=("geo", "knn", "spatial", "topk"),
)
def geo_knn_nearest_suppliers(spark, sf_dir):
    """Radius-bounded k-nearest-neighbors: each customer's 3 nearest
    suppliers within 8° planar distance, ties broken on supplier id so both
    engines pick identical rows (total order — registry determinism rule).

    Radius-bounded kNN is the distributed-safe formulation: unbounded kNN
    must search outward ring by ring (data-dependent iteration), while a
    radius bound turns it into one cell join + one per-key top-k window —
    and real pipelines (venue conflation, nearest-POI features) always have
    a domain radius. Candidates come from the SAME grid join as
    geo_cell_join_nearby_pairs (never a cross join); the window partition
    holds only each customer's in-radius candidates, bounded by point
    density, not by |suppliers|."""
    from etl_expenses_spark.operators.geo import pairs_within_radius

    cust = _points(T(spark, sf_dir, "customer"), "c_custkey", 1, 2, "a_key")
    supp = _points(T(spark, sf_dir, "supplier"), "s_suppkey", 3, 4, "b_key")
    pairs = pairs_within_radius(cust, supp, _KNN_RADIUS)
    w = W.partitionBy("a_key").orderBy("dist2", "b_key")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("a_key").alias("c_custkey"),
            F.col("rk"),
            F.col("b_key").alias("s_suppkey"),
            F.col("dist2"),
        )
    )


@query(
    "geo_cell_density_topk",
    oracle=f"""
        WITH c AS (
            SELECT {_LAT.format(k="c_custkey", salt=1)} AS lat,
                   {_LON.format(k="c_custkey", salt=2)} AS lon
            FROM customer),
        cells AS (
            SELECT (lon + 180000000) // 10000000 AS cx,
                   (lat + 85000000) // 10000000 AS cy,
                   CAST(COUNT(*) AS BIGINT) AS n_points
            FROM c GROUP BY 1, 2),
        ranked AS (
            SELECT cx, cy, n_points, ROW_NUMBER() OVER (
                ORDER BY n_points DESC, cx, cy) AS rk
            FROM cells)
        SELECT cx, cy, n_points FROM ranked WHERE rk <= 20
    """,
    tags=("geo", "agg", "spatial"),
)
def geo_cell_density_topk(spark, sf_dir):
    """Densest 10°-grid cells by customer count — the heat-map / hotspot
    aggregate, and the diagnostic you run BEFORE a distance join to find
    the hot cells that will need salting. One map-side-combined groupBy on
    the cell id + a global top-20 (TakeOrderedAndProject), with the full
    (n_points DESC, cx, cy) total order so both engines pick identical
    rows. Scale: cells are a fixed 612-slot key space at this grid — the
    aggregate state is O(cells), independent of row count."""
    from etl_expenses_spark.operators.geo import synth_lat, synth_lon, with_cell

    pts = T(spark, sf_dir, "customer").select(
        synth_lat(F.col("c_custkey"), 1).alias("lat"),
        synth_lon(F.col("c_custkey"), 2).alias("lon"),
    )
    cells = (
        with_cell(pts, 10_000_000)
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    # total order -> TakeOrderedAndProject (per-partition top-20 heaps,
    # only 20 rows per partition reach the driver-side merge)
    return cells.orderBy(F.col("n_points").desc(), "cx", "cy").limit(20)


# 3° proximity gate: the synthetic coordinates are a LATTICE (linear hash
# of the key), whose minimum same-table pair distance is ~2.76e6 µdeg — a
# smaller radius would make the query vacuously empty. 3° admits 505 pairs
# at sf0.01, a real non-trivial driver check.
_DUP_RADIUS = 3_000_000


@query(
    "geo_neardup_points_selfjoin",
    oracle=f"""
        WITH c AS (
            SELECT c_custkey,
                   {_LAT.format(k="c_custkey", salt=1)} AS lat,
                   {_LON.format(k="c_custkey", salt=2)} AS lon
            FROM customer),
        pairs AS (
            SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
                   (a.lat - b.lat) * (a.lat - b.lat)
                 + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
            FROM c a CROSS JOIN c b
            WHERE a.c_custkey < b.c_custkey)
        SELECT key_a, key_b, CAST(dist2 AS BIGINT) AS dist2
        FROM pairs
        WHERE dist2 <= {_DUP_RADIUS}::BIGINT * {_DUP_RADIUS}
    """,
    tags=("geo", "dedup", "spatial", "selfjoin"),
)
def geo_neardup_points_selfjoin(spark, sf_dir):
    """Spatial SELF-join near-duplicate candidates: customer points within
    3° of each other, as (key_a < key_b) canonical pairs — the venue-
    conflation / duplicate-listing first pass (two records this close are
    record-linkage candidates regardless of their text).

    The self-join case matters separately from the two-relation join: both
    sides are the SAME big relation, so the replicate-the-small-side trick
    has no small side. The grid join still works — one side replicated 9×,
    and the a<b filter both canonicalizes the symmetric output and halves
    the refine work. At 100 TB density decides the cost (Σ|cell|²), which
    is exactly what geo_cell_density_topk audits first; the oracle is the
    brute-force n² self-join, proving completeness again."""
    from etl_expenses_spark.operators.geo import pairs_within_radius

    cust_a = _points(T(spark, sf_dir, "customer"), "c_custkey", 1, 2, "a_key")
    cust_b = cust_a.select(
        F.col("a_key").alias("b_key"), "lat", "lon"
    )
    return (
        pairs_within_radius(cust_a, cust_b, _DUP_RADIUS)
        .filter(F.col("a_key") < F.col("b_key"))
        .select(
            F.col("a_key").alias("key_a"),
            F.col("b_key").alias("key_b"),
            F.col("dist2"),
        )
    )
