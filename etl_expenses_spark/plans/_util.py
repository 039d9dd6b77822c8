"""Shared helpers for the query inventory."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_expenses_spark.sources.readers import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


from etl_expenses_spark.caching import (  # noqa: F401  (re-export for plans)
    clear_tracked_caches,
    tracked_persist,
)


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast to decimal before aggregating.

    Summing doubles is order-dependent; summing decimals is exact and
    associative, so Spark (parallel partial aggregates) and the DuckDB oracle
    get bit-identical results.

    CAVEAT — only cast *clean* columns (values whose decimal representation
    already fits the target scale, e.g. 2-decimal prices). DuckDB converts
    double→decimal via the shortest decimal string while Spark uses a
    different path, and the engines disagree on tie rounding (HALF_EVEN vs
    HALF_UP) — so casting a computed ("dirty") double is not portable. Do
    arithmetic *in the decimal domain* instead (exact in both engines), and
    use FLOOR where explicit cent-truncation is wanted.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact decimal sum of a *clean* column, surfaced as double."""
    return F.sum(dec(col, scale, precision)).cast("double")


def work_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf) scratch directory, wiped on entry.

    Queries that stage data on local disk (stream replays, codec landings)
    must NOT mkdtemp a fresh directory per invocation: the returned
    DataFrame reads those files lazily, so the dir can't be deleted before
    the caller materializes it — and an un-deleted random dir leaks a full
    table copy on every bench/correctness run (ADVICE r7). A deterministic
    path keyed by (query, sf tier) is overwritten in place instead: disk
    usage stays bounded at one copy per query×tier no matter how many times
    the round's harnesses re-run it.

    The path is scoped per-user (ADVICE r8): on a shared machine another
    user's leftover dir would make rmtree/makedirs fail, and two users
    running the same query/tier concurrently would clobber each other
    mid-read. Within one user the wipe-on-entry contract still assumes
    single-run exclusivity per (query, sf tier) — the harnesses serialize
    query execution, and concurrent self-runs of the SAME query are out of
    contract (deliberately: a per-PID component would defeat the bounded
    disk-usage guarantee this helper exists for).
    """
    import getpass
    import os
    import re
    import shutil
    import tempfile

    slug = re.sub(r"[^A-Za-z0-9_.-]+", "_", sf_dir.strip("/"))
    try:
        user = re.sub(r"[^A-Za-z0-9_.-]+", "_", getpass.getuser())
    except Exception:  # no passwd entry (containers) — fall back to uid
        user = f"uid{os.getuid()}"
    path = os.path.join(
        tempfile.gettempdir(), f"etl_spark_work_{user}_{name}_{slug}"
    )
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def state_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(artifact, sf) directory that PERSISTS across
    invocations and sessions — the home of WAP-published stored state
    (e.g. the incremental-APSS curation tables, VERDICT r12 #2). Unlike
    ``work_dir`` it is NOT wiped on entry: the whole point is that a later
    run reads back what an earlier run published, like a warehouse table.
    Content validity is the caller's contract (fingerprint the source and
    republish on mismatch); disk usage stays bounded because publishers
    use ``publish_replace`` + the WAP vacuum, one artifact per tier."""
    import getpass
    import os
    import re
    import tempfile

    slug = re.sub(r"[^A-Za-z0-9_.-]+", "_", sf_dir.strip("/"))
    try:
        user = re.sub(r"[^A-Za-z0-9_.-]+", "_", getpass.getuser())
    except Exception:  # no passwd entry (containers) — fall back to uid
        user = f"uid{os.getuid()}"
    path = os.path.join(
        tempfile.gettempdir(), f"etl_spark_state_{user}_{name}_{slug}"
    )
    os.makedirs(path, exist_ok=True)
    return path
