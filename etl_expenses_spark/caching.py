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
