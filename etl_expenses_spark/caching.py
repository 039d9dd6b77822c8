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

from contextlib import contextmanager as _contextmanager

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


# Adaptive BSP-state sizing (r14, guide §2 scale-adaptive partitioning):
# a BSP loop's checkpointed state keeps the FIXED partition count of the
# plan that produced it (shuffle.partitions-ish) even when the state has
# collapsed to a few hundred rows — so every subsequent round schedules a
# full width of no-op tasks (profiled: the curation funnel's CC rounds ran
# 33-task localCheckpoint jobs with ZERO task time, ~0.24 s of pure
# scheduling per round). When the materializing job has already counted
# the rows (the observed-metrics path), the rebuilt leaf is coalesced
# (narrow, no shuffle) down to ceil(rows / _BSP_ROWS_PER_PARTITION)
# partitions — identity whenever the state is big enough to deserve its
# width, so the 100 TB path is untouched.
_BSP_ROWS_PER_PARTITION = 65536


def _rebuild_leaf(ck: DataFrame, rows: int | None = None) -> DataFrame:
    """Fresh-stats leaf over an already-checkpointed DataFrame's RDD blocks,
    optionally coalesced to match the observed row count (see above)."""
    spark = ck.sparkSession
    jdf = ck._jdf
    jrdd = jdf.javaRDD()
    if rows is not None:
        cur = jrdd.getNumPartitions()
        want = max(1, min(cur, -(-rows // _BSP_ROWS_PER_PARTITION)))
        if want < cur:
            jrdd = jrdd.coalesce(want)
    return DataFrame(
        spark._jsparkSession.createDataFrame(jrdd, jdf.schema()),
        spark,
    )


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
    return _rebuild_leaf(ck)


def bsp_checkpoint_sized(df: DataFrame, return_rows: bool = False):
    """``bsp_checkpoint`` that additionally observes the row count during
    the checkpoint's own materialization job and coalesces the rebuilt
    leaf adaptively (r14) — for loop-invariant relations (edge lists,
    adjacency) whose width every round's joins inherit. With
    ``return_rows`` the observed count is returned alongside, so a loop
    can size ITS OWN per-round behavior from the state's true scale."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    ck = df.observe(obs, F.count(F.lit(1)).alias("rows")).localCheckpoint()
    if not hasattr(ck, "_jdf") or not hasattr(ck.sparkSession, "_jsparkSession"):
        raise RuntimeError(
            "bsp_checkpoint_sized requires classic (JVM-local) PySpark — "
            "see bsp_checkpoint."
        )
    rows = int(obs.get["rows"])
    leaf = _rebuild_leaf(ck, rows)
    return (leaf, rows) if return_rows else leaf


@_contextmanager
def small_state_rounds(spark, enabled: bool = True):
    """Scope AQE's post-shuffle coalescing to SIZE-based targeting for a
    BSP loop whose state is observed tiny (r14, guide §2 scale-adaptive
    partitioning).

    AQE's default ``coalescePartitions.parallelismFirst=true`` floors the
    coalesced partition count at the session's default parallelism, so a
    loop whose whole state is a few hundred rows still runs every round's
    shuffle at full session width — profiled on the curation funnel's CC
    loop as 33-task jobs with ZERO task time, ~0.25 s of pure scheduling
    each. Inside this scope AQE targets ``advisoryPartitionSizeInBytes``
    instead, which collapses KB-scale shuffles to one task. Callers must
    enable it ONLY when the loop's per-round work is proportional to an
    observed-small state (per-row cost ~constant); compute-dense rounds
    (k-core H-steps, truss wedge expansion) keep the default. The conf is
    restored on exit, so surrounding plan execution is untouched."""
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    if not enabled:
        yield
        return
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def bsp_checkpoint_flagged(
    df: DataFrame, flag_col: str, size_leaf: bool = True
) -> tuple[DataFrame, int]:
    """``bsp_checkpoint`` plus the count of rows whose boolean ``flag_col``
    is true, collected as an OBSERVED METRIC during the checkpoint's own
    materialization job (r13, guide §7.3 driver round-trips): every BSP
    loop here used to follow each round's eager checkpoint with a separate
    ``filter(flag).limit(1).count()`` probe action — one extra driver
    round-trip of pure scheduling cost per round, at every scale. A
    ``CollectMetrics`` node rides the checkpointed plan instead; the
    localCheckpoint action populates it, and ``Observation.get`` merely
    waits for the listener (measured ≤ a few ms, no job). The same metric
    row carries the state's total row count, which sizes the rebuilt
    leaf's partitioning (r14, see _BSP_ROWS_PER_PARTITION). Returns
    ``(checkpointed df, n_flagged)``."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    ck = df.observe(
        obs,
        F.count_if(F.col(flag_col)).alias("n"),
        F.count(F.lit(1)).alias("rows"),
    ).localCheckpoint()
    if not hasattr(ck, "_jdf") or not hasattr(ck.sparkSession, "_jsparkSession"):
        raise RuntimeError(
            "bsp_checkpoint_flagged requires classic (JVM-local) PySpark — "
            "see bsp_checkpoint."
        )
    got = obs.get
    return (
        _rebuild_leaf(ck, int(got["rows"]) if size_leaf else None),
        int(got["n"]),
    )
