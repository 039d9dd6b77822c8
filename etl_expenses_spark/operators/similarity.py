"""Similarity search over embedding columns (north star).

Two paths:
- brute-force cosine top-k: exact, one scan, TakeOrdered — the correctness
  baseline and perfectly adequate when the query side is small.
- LSH-bucketed ANN: random-hyperplane signatures narrow the scan to one
  bucket — the 100 TB path (bucket id is a partition key; a query touches
  one bucket ≈ 1/2^H of the data). Hyperplanes are derived deterministically
  from a seed so plans are reproducible across runs/executors.

All vector math is expressed with F.zip_with/F.aggregate over
array<float> — JVM-side, no Python in the scan. (A Pandas-UDF/numpy variant
is the right call when vectors are >1k dims; at 64 dims the expression path
avoids Arrow transfer entirely.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame
    (columns: q — the query vector). The crossJoin broadcasts the one-row
    side; the scan stays a single stage ending in TakeOrdered."""
    joined = embeddings.crossJoin(F.broadcast(query))
    sim = cosine(F.col(vec_col), F.col("q"))
    return (
        joined.select(
            F.col(id_col),
            # decimal(18,6) quantization: differences below 1e-6 are summation
            # noise, and quantizing makes cross-engine comparison exact
            sim.cast("decimal(18,6)").cast("double").alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_bucket(vec: Column, dims: int, n_planes: int = 8, seed: int = 42) -> Column:
    """LSH bucket id = sign-bit signature of dot products with n_planes
    pseudo-random hyperplanes. Plane components are derived from
    xxhash64(seed, plane, dim) — deterministic, centered on 0."""
    def plane_component(h: int):
        # closure factory — a 2-arg pyspark transform lambda would receive
        # (element, index), so default-arg capture of h is unusable here
        return lambda d: (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(h), d), F.lit(2001)) - 1000
        ).cast("double") / 1000.0

    bits = []
    for h in range(n_planes):
        comp = F.transform(F.sequence(F.lit(0), F.lit(dims - 1)), plane_component(h))
        proj = F.aggregate(
            F.zip_with(vec, comp, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << h)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def cosine_topk_lsh(
    embeddings: DataFrame,
    query: DataFrame,
    dims: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict the exact scan to the query's hyperplane bucket.
    Recall < 1 by construction; at scale, write the table bucketed/partitioned
    by this id so a query prunes to one partition."""
    bucketed = embeddings.withColumn("bucket", hyperplane_bucket(F.col(vec_col), dims, n_planes))
    q = query.withColumn("qbucket", hyperplane_bucket(F.col("q"), dims, n_planes))
    joined = bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
    sim = cosine(F.col(vec_col), F.col("q"))
    return (
        joined.select(F.col(id_col), sim.cast("decimal(18,6)").cast("double").alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )
