"""Write-audit-publish: transactional-ish batch gold writes on plain parquet.

Plain parquet directory appends are not atomic: a crashed job leaves partial
files that readers see. The reference handles failure with a compensation
lambda that issues rollback UPDATEs and deletes temp objects
(`/root/reference/compensation_flow/lambda_function.py:34-56`). The batch
engine replaces that with the write-audit-publish protocol:

1. WRITE the batch to an unpublished versioned staging dir,
2. AUDIT the staged data by re-reading it (row gates, invariants),
3. PUBLISH by atomically renaming the version dir into the table root and
   atomically replacing the ``_CURRENT`` manifest readers resolve.

A crash before step 3 leaves garbage only in ``_staging`` (never visible);
a failed audit never publishes. Readers always see a consistent set of
fully-written versions — no torn reads, no rollback logic. This is the same
commit-protocol shape table formats (Iceberg/Delta) productionize; local
``os.replace`` stands in for the metastore swap and is atomic on any POSIX
filesystem.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

AuditFn = Callable[[DataFrame], str | None]  # error message or None = pass

_CURRENT = "_CURRENT"
_STAGING = "_staging"
_HISTORY = "_HISTORY"


def _committed_versions(table_root: str) -> list[int]:
    cur = os.path.join(table_root, _CURRENT)
    if not os.path.exists(cur):
        return []
    with open(cur) as f:
        content = f.read().strip()
    return [int(v) for v in content.split(",") if v]


def _claim_version(table_root: str) -> tuple[int, str]:
    """Allocate the next version number with an O_EXCL claim marker so two
    concurrent publishers on the same filesystem can never pick the same
    version (each loser of the create race bumps and retries). The MANIFEST
    swap itself remains last-writer-wins — run one publisher per table, or
    front this with a real metastore/table-format commit at scale; the
    marker guarantees version-dir isolation either way."""
    os.makedirs(os.path.join(table_root, _STAGING), exist_ok=True)
    committed = _committed_versions(table_root)
    version = (max(committed) + 1) if committed else 1
    while True:
        marker = os.path.join(table_root, _STAGING, f"v{version}.claim")
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return version, marker
        except FileExistsError:
            version += 1


def publish_append(
    spark: SparkSession,
    df: DataFrame,
    table_root: str,
    audits: list[AuditFn] | None = None,
) -> int:
    """Stage ``df`` as the table's next version, audit it, publish it.

    Returns the published version number; raises ValueError (table
    untouched) if any audit rejects the staged data.
    """
    version, marker = _claim_version(table_root)
    staged = os.path.join(table_root, _STAGING, f"v{version}")
    final = os.path.join(table_root, f"v{version}")

    try:
        # WRITE — invisible to readers (staging dir is not in any manifest)
        df.write.mode("overwrite").parquet(staged)

        # AUDIT — on what was actually written, not the in-flight plan
        staged_df = spark.read.parquet(staged)
        for audit in audits or []:
            err = audit(staged_df)
            if err is not None:
                shutil.rmtree(staged, ignore_errors=True)
                raise ValueError(f"audit rejected staged v{version}: {err}")

        # PUBLISH — two renames, each atomic; readers resolve _CURRENT so the
        # new version is invisible until the manifest swap (the second rename)
        os.replace(staged, final)
        committed = _committed_versions(table_root)  # re-read: narrowest window
        tmp = os.path.join(table_root, f"{_CURRENT}.tmp")
        with open(tmp, "w") as f:
            f.write(",".join(str(v) for v in committed + [version]))
        os.replace(tmp, os.path.join(table_root, _CURRENT))
        _append_history(table_root, version, committed + [version])
    finally:
        if os.path.exists(marker):
            os.remove(marker)
    return version


def publish_replace(
    spark: SparkSession,
    df: DataFrame,
    table_root: str,
    audits: list[AuditFn] | None = None,
) -> int:
    """Stage ``df``, audit it, publish it as the table's NEW CURRENT STATE
    (manifest names only this version — the write path a MERGE/UPSERT or
    full rewrite uses, vs ``publish_append``'s union semantics). The prior
    state's version dirs stay on disk and remain reachable via the
    snapshot log (read_as_of) until vacuum — exactly the table-format
    contract: a merge creates a new snapshot, it never rewrites history.
    """
    version, marker = _claim_version(table_root)
    staged = os.path.join(table_root, _STAGING, f"v{version}")
    final = os.path.join(table_root, f"v{version}")
    try:
        df.write.mode("overwrite").parquet(staged)
        staged_df = spark.read.parquet(staged)
        for audit in audits or []:
            err = audit(staged_df)
            if err is not None:
                shutil.rmtree(staged, ignore_errors=True)
                raise ValueError(f"audit rejected staged v{version}: {err}")
        os.replace(staged, final)
        tmp = os.path.join(table_root, f"{_CURRENT}.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(table_root, _CURRENT))
        _append_history(table_root, version, [version])
    finally:
        if os.path.exists(marker):
            os.remove(marker)
    return version


def read_published(spark: SparkSession, table_root: str) -> DataFrame:
    """Scan exactly the committed versions (union of their parquet dirs)."""
    versions = _committed_versions(table_root)
    if not versions:
        raise FileNotFoundError(f"no published versions under {table_root}")
    return spark.read.parquet(*[os.path.join(table_root, f"v{v}") for v in versions])


def audit_min_rows(n: int) -> AuditFn:
    return lambda df: None if df.count() >= n else f"fewer than {n} rows"


def audit_no_nulls(cols: list[str]) -> AuditFn:
    def check(df: DataFrame) -> str | None:
        from pyspark.sql import functions as F

        bad = df.filter(
            " OR ".join(f"{c} IS NULL" for c in cols)
        ).limit(1).count() if cols else 0
        return None if bad == 0 else f"NULL in one of {cols}"

    return check


def audit_unique_key(cols: list[str]) -> AuditFn:
    def check(df: DataFrame) -> str | None:
        total = df.count()
        distinct = df.select(*cols).distinct().count()
        return None if total == distinct else f"duplicate keys on {cols}"

    return check


def audit_metrics_single_pass(
    rules: list[tuple[str, "Column", Callable[[object], bool]]],
) -> AuditFn:
    """All aggregate invariants in ONE scan of the staged data.

    ``rules`` = (name, aggregate Column, predicate over its value). The
    per-rule audits above each rescan the staged batch (3 rules = 3 full
    scans — fine at MB, prohibitive at 100 TB); this folds every metric
    into a single ``agg`` so the audit costs one scan total.
    """

    def check(df: DataFrame) -> str | None:
        row = df.agg(*[c.alias(n) for n, c, _ in rules]).first()
        for n, _, pred in rules:
            if not pred(row[n]):
                return f"metric rule '{n}' failed (value={row[n]!r})"
        return None

    return check


def publish_append_observed(
    spark: SparkSession,
    df: DataFrame,
    table_root: str,
    rules: list[tuple[str, "Column", Callable[[object], bool]]],
) -> int:
    """WAP where the audit metrics ride ON the staging write itself
    (``df.observe``) — zero extra scans: the aggregates are folded into the
    write job, the staged files land, THEN the metrics are inspected and
    the version is published or discarded. The discard path only removes
    never-published staging files, so a rejected batch is invisible to
    readers, same contract as ``publish_append``.

    This is the production shape for auditing a 100 TB batch: re-reading
    what you just wrote doubles the I/O bill; observation metrics are free.
    """
    from pyspark.sql import Observation

    version, marker = _claim_version(table_root)
    staged = os.path.join(table_root, _STAGING, f"v{version}")
    final = os.path.join(table_root, f"v{version}")

    try:
        obs = Observation(f"wap_audit_v{version}")
        observed = df.observe(obs, *[c.alias(n) for n, c, _ in rules])
        observed.write.mode("overwrite").parquet(staged)  # WRITE (+ metrics)

        metrics = obs.get  # AUDIT — already computed by the write job
        for n, _, pred in rules:
            if not pred(metrics[n]):
                shutil.rmtree(staged, ignore_errors=True)
                raise ValueError(
                    f"observed audit rejected staged v{version}: "
                    f"rule '{n}' failed (value={metrics[n]!r})"
                )

        os.replace(staged, final)  # PUBLISH
        committed = _committed_versions(table_root)
        tmp = os.path.join(table_root, f"{_CURRENT}.tmp")
        with open(tmp, "w") as f:
            f.write(",".join(str(v) for v in committed + [version]))
        os.replace(tmp, os.path.join(table_root, _CURRENT))
    finally:
        if os.path.exists(marker):
            os.remove(marker)
    return version


def compact_published(
    spark: SparkSession,
    table_root: str,
    target_files: int = 1,
) -> int:
    """Compact every committed version into one new version with
    ``target_files`` parquet files, then atomically swap the manifest to
    point at it alone.

    Small-file buildup is the chronic failure mode of append-style gold
    tables (every micro-batch/merge adds files; at 100 TB a scan pays an
    open/footer cost per file and the driver pays listing time). Compaction
    here is just WAP again: WRITE the coalesced copy as the next version,
    AUDIT nothing changed (row count preserved — cheap, metadata-only on
    parquet), PUBLISH a manifest naming only the compacted version. Old
    version dirs stay on disk for time-travel-ish debugging (a real table
    format would garbage-collect them after a retention window).
    """
    committed = _committed_versions(table_root)
    if not committed:
        raise FileNotFoundError(f"no published versions under {table_root}")
    current = read_published(spark, table_root)
    n_before = current.count()

    version, marker = _claim_version(table_root)
    staged = os.path.join(table_root, _STAGING, f"v{version}")
    final = os.path.join(table_root, f"v{version}")
    try:
        current.coalesce(target_files).write.mode("overwrite").parquet(staged)

        n_after = spark.read.parquet(staged).count()
        if n_after != n_before:
            shutil.rmtree(staged, ignore_errors=True)
            raise ValueError(f"compaction row drift: {n_before} -> {n_after}")

        os.replace(staged, final)
        tmp = os.path.join(table_root, f"{_CURRENT}.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))  # manifest now names ONLY the compacted version
        os.replace(tmp, os.path.join(table_root, _CURRENT))
        _append_history(table_root, version, [version])
    finally:
        if os.path.exists(marker):
            os.remove(marker)
    return version


def vacuum(table_root: str, keep_unreferenced: bool = False) -> list[str]:
    """Remove files no reader can see: leftover ``_staging`` writes (crashed
    or audit-rejected jobs) and version dirs no longer named by the
    manifest (superseded by compaction). Returns the removed paths.

    Safe by construction: the manifest (_CURRENT) is the single source of
    reader truth and this only deletes paths outside it — the analog of a
    table format's expire-snapshots/vacuum with retention zero. Anything
    versioned NEWER than the manifest's high-water mark is skipped: it may
    belong to a concurrent publisher that claimed/renamed its version dir
    but has not yet swapped the manifest. Pass ``keep_unreferenced=True``
    to drop only staging garbage and retain superseded versions for
    debugging.
    """

    def _vnum(name: str) -> int | None:
        stem = name.split(".")[0]
        if stem.startswith("v") and stem[1:].isdigit():
            return int(stem[1:])
        return None

    committed = _committed_versions(table_root)
    high_water = max(committed) if committed else 0
    removed: list[str] = []
    staging_root = os.path.join(table_root, _STAGING)
    if os.path.isdir(staging_root):
        for leftover in sorted(os.listdir(staging_root)):
            v = _vnum(leftover)
            if v is not None and v > high_water:
                continue  # possibly a concurrent writer's in-flight stage/claim
            p = os.path.join(staging_root, leftover)
            shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else os.remove(p)
            removed.append(p)
    if not keep_unreferenced:
        live = {f"v{v}" for v in committed}
        for entry in sorted(os.listdir(table_root)):
            p = os.path.join(table_root, entry)
            v = _vnum(entry)
            if (
                os.path.isdir(p)
                and v is not None
                and entry not in live
                and v <= high_water
                and entry != _STAGING
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    return removed


def versions(table_root: str) -> list[int]:
    """The committed version list (manifest order) — the table's readable
    history. Superseded versions (dropped from the manifest by compaction)
    remain on disk until vacuum and stay individually readable via
    ``read_version``."""
    return _committed_versions(table_root)


def read_version(spark: SparkSession, table_root: str, version: int) -> DataFrame:
    """Time-travel-ish read of ONE version dir (a single publish's rows —
    audit forensics, incremental consumers reading exactly the batches
    they haven't seen). Any version that was ever published and not yet
    vacuumed is readable, including ones compaction superseded."""
    path = os.path.join(table_root, f"v{version}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {version} not on disk under {table_root}")
    return spark.read.parquet(path)


def _append_history(table_root: str, commit: int, manifest: list[int]) -> None:
    """Append one snapshot line ``commit:v0,v1,...`` to the manifest LOG.

    The _CURRENT manifest holds only the latest state; the log keeps every
    state ever committed, which is what gives the table Iceberg-style
    snapshot time travel (read_as_of) across appends AND compactions.
    Appended after the atomic manifest swap: a crash in between loses only
    the newest snapshot's history line (read_as_of falls back to the
    manifest-prefix rule for it), never corrupts prior lines."""
    with open(os.path.join(table_root, _HISTORY), "a") as f:
        f.write(f"{commit}:{','.join(str(v) for v in manifest)}\n")


def snapshots(table_root: str) -> dict[int, list[int]]:
    """commit id -> the manifest (version list) as of that commit."""
    path = os.path.join(table_root, _HISTORY)
    out: dict[int, list[int]] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                commit, vs = line.split(":", 1)
                out[int(commit)] = [int(v) for v in vs.split(",") if v]
    return out


def read_as_of(spark: SparkSession, table_root: str, commit: int) -> DataFrame:
    """TIME TRAVEL: the table exactly as it stood after ``commit`` was
    published — the union of the versions that commit's manifest named,
    replayed from the snapshot log. Works across compaction (a pre-compact
    commit resolves to the original small versions, which stay on disk
    until ``vacuum``); after vacuum, snapshots older than the retained
    files raise FileNotFoundError — the standard retention contract.

    Falls back to the manifest-prefix rule (committed versions ≤ commit)
    when the snapshot log predates this feature or lost its newest line to
    a crash."""
    snaps = snapshots(table_root)
    manifest = snaps.get(int(commit))
    if manifest is None:
        prefix = [v for v in _committed_versions(table_root) if v <= int(commit)]
        if not prefix or int(commit) not in prefix:
            raise FileNotFoundError(
                f"no snapshot for commit {commit} under {table_root}"
            )
        manifest = prefix
    paths = [os.path.join(table_root, f"v{v}") for v in manifest]
    for p in paths:
        if not os.path.isdir(p):
            raise FileNotFoundError(
                f"snapshot {commit} references vacuumed version dir {p}; "
                "older-than-retention time travel is gone by design"
            )
    return spark.read.parquet(*paths)
