"""Session-scoped lifetime management for persisted intermediates.

Operators persist() DataFrames that out-live their builder function (the
caller collects the returned, lineage-dependent DataFrame later), so the
builder can't unpersist locally without recomputing the cached stage.
Instead every persist goes through ``tracked_persist`` and the query
registry clears the PREVIOUS query's caches at the start of each build —
a long sequential session (the driver runs 50+ queries in one JVM) holds
at most one query's cached blocks instead of accumulating until LRU
eviction pressure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED_CACHES: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() whose lifetime ends when the next registry query builds."""
    _TRACKED_CACHES.append(df.persist())
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame (e.g. the surviving cache of
    an iterative loop that unpersists its per-round intermediates)."""
    _TRACKED_CACHES.append(df)
    return df


def clear_tracked_caches() -> None:
    while _TRACKED_CACHES:
        _TRACKED_CACHES.pop().unpersist()


def bsp_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint for BSP-loop state that does NOT inherit the origin
    plan's cost statistics.

    ``Dataset.localCheckpoint`` copies the origin plan's stats estimate
    onto the new LogicalRDD leaf. In an iterative loop whose per-round
    plan joins the state against something derived from the state, the
    size-only stats visitor MULTIPLIES the two sides, so the estimate's
    bit length roughly DOUBLES per checkpointed round (measured on the LPA
    loop: b_{n+1} = 2·b_n + 63). By round ~20 Catalyst is multiplying
    multi-megabit BigIntegers on every planning pass, and at bit length
    2³¹ stats estimation throws ``BigInteger would overflow supported
    range`` — the loop dies planning, not executing.

    Fix: after the eager checkpoint, rebuild the leaf from the
    checkpointed JVM row RDD (``createDataFrame(javaRDD, schema)``) —
    same materialized blocks, same lazy scan, but a fresh leaf whose
    default stats don't compound. Stays entirely JVM-side (no Python
    round-trip, no disk). Join strategy is unaffected: checkpointed
    leaves already carried conservative huge estimates, so static
    broadcast was never chosen off them — AQE's runtime sizes decide, as
    before.
    """
    ck = df.localCheckpoint()
    spark = ck.sparkSession
    # Classic-Spark internals (_jdf / _jsparkSession / the
    # createDataFrame(JavaRDD, StructType) overload) — absent under Spark
    # Connect and not a stable API. Guard with a self-diagnosing error
    # (ADVICE r8) instead of an opaque Py4J failure far from the call site.
    if not hasattr(ck, "_jdf") or not hasattr(spark, "_jsparkSession"):
        raise RuntimeError(
            "bsp_checkpoint requires classic (JVM-local) PySpark: it "
            "rebuilds the checkpointed leaf via Dataset._jdf.javaRDD() to "
            "shed compounding stats estimates. Under Spark Connect these "
            "internals do not exist — fall back to df.localCheckpoint() "
            "and bound the loop's round count, or run on a classic session."
        )
    jdf = ck._jdf
    return DataFrame(
        spark._jsparkSession.createDataFrame(jdf.javaRDD(), jdf.schema()),
        spark,
    )


def bsp_checkpoint_flagged(df: DataFrame, flag_col: str) -> tuple[DataFrame, int]:
    """``bsp_checkpoint`` plus the count of rows whose boolean ``flag_col``
    is true, collected as an OBSERVED METRIC during the checkpoint's own
    materialization job (r13, guide §7.3 driver round-trips): every BSP
    loop here used to follow each round's eager checkpoint with a separate
    ``filter(flag).limit(1).count()`` probe action — one extra driver
    round-trip of pure scheduling cost per round, at every scale. A
    ``CollectMetrics`` node rides the checkpointed plan instead; the
    localCheckpoint action populates it, and ``Observation.get`` merely
    waits for the listener (measured ≤ a few ms, no job). Returns
    ``(checkpointed df, n_flagged)``."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    ck = bsp_checkpoint(
        df.observe(obs, F.count_if(F.col(flag_col)).alias("n"))
    )
    return ck, int(obs.get["n"])
