"""Write-audit-publish commit protocol and salted-join skew mitigation."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from etl_expenses_spark.operators.skew import salted_join, salted_join_hot_keys
from etl_expenses_spark.operators.wap import (
    audit_min_rows,
    audit_no_nulls,
    audit_unique_key,
    publish_append,
    read_published,
)
from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def table_root():
    root = tempfile.mkdtemp(prefix="wap_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_wap_publish_then_read(spark, table_root):
    orders = load_table(spark, SF_DIR, "orders")
    first = orders.filter(F.col("o_orderkey") < 500)
    v = publish_append(
        spark, first, table_root,
        audits=[audit_min_rows(1), audit_unique_key(["o_orderkey"])],
    )
    assert v == 1
    assert read_published(spark, table_root).count() == first.count()


def test_wap_failed_audit_never_publishes(spark, table_root):
    orders = load_table(spark, SF_DIR, "orders")
    publish_append(spark, orders.filter(F.col("o_orderkey") < 500), table_root)
    before = read_published(spark, table_root).count()

    dupes = orders.filter(F.col("o_orderkey") < 100)
    bad = dupes.unionByName(dupes)  # duplicate keys → audit must reject
    with pytest.raises(ValueError, match="audit rejected"):
        publish_append(spark, bad, table_root, audits=[audit_unique_key(["o_orderkey"])])
    # table is exactly what it was — failed version invisible
    assert read_published(spark, table_root).count() == before

    null_rows = spark.createDataFrame([(None, 1)], "o_orderkey long, x long")
    with pytest.raises(ValueError, match="audit rejected"):
        publish_append(spark, null_rows, table_root, audits=[audit_no_nulls(["o_orderkey"])])
    assert read_published(spark, table_root).count() == before


def test_wap_versions_accumulate(spark, table_root):
    orders = load_table(spark, SF_DIR, "orders")
    a = orders.filter(F.col("o_orderkey") < 300)
    b = orders.filter((F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600))
    assert publish_append(spark, a, table_root) == 1
    assert publish_append(spark, b, table_root) == 2
    got = read_published(spark, table_root)
    assert got.count() == a.count() + b.count()
    assert got.select("o_orderkey").distinct().count() == got.count()


def _plain(events, customer):
    return events.join(customer, "user_id", "inner")


def test_salted_join_equals_plain_join(spark):
    e = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    c = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    want = {(r.event_id, r.c_mktsegment) for r in _plain(e, c).collect()}
    got = {
        (r.event_id, r.c_mktsegment)
        for r in salted_join(e, c, "user_id", buckets=8).collect()
    }
    assert got == want


def test_salted_hot_keys_equals_plain_join(spark):
    e = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    c = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    # treat the 3 most frequent users as "hot"
    hot = [r.user_id for r in e.groupBy("user_id").count().orderBy(F.desc("count")).limit(3).collect()]
    want = {(r.event_id, r.c_mktsegment) for r in _plain(e, c).collect()}
    got = {
        (r.event_id, r.c_mktsegment)
        for r in salted_join_hot_keys(e, c, "user_id", hot, buckets=8).collect()
    }
    assert got == want


def test_observed_audit_publishes_good_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.wap import (
        publish_append_observed,
        read_published,
    )

    root = str(tmp_path / "obs_tbl")
    orders = load_table(spark, SF_DIR, "orders")
    rules = [
        ("n_rows", F.count(F.lit(1)), lambda v: v >= 100),
        ("null_keys", F.count_if(F.col("o_orderkey").isNull()), lambda v: v == 0),
        ("max_price", F.max("o_totalprice"), lambda v: v < 1e9),
    ]
    v = publish_append_observed(spark, orders, root, rules)
    assert v == 1
    assert read_published(spark, root).count() == orders.count()


def test_observed_audit_rejects_and_leaves_nothing_published(spark, tmp_path):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.wap import (
        publish_append_observed,
        read_published,
    )

    root = str(tmp_path / "obs_tbl_bad")
    orders = load_table(spark, SF_DIR, "orders")
    rules = [("n_rows", F.count(F.lit(1)), lambda v: v >= 10**9)]
    with _pytest.raises(ValueError, match="n_rows"):
        publish_append_observed(spark, orders, root, rules)
    with _pytest.raises(FileNotFoundError):
        read_published(spark, root)


def test_compaction_preserves_data_and_cuts_files(spark, tmp_path):
    import glob

    from etl_expenses_spark.operators.wap import (
        compact_published,
        publish_append,
        read_published,
    )

    root = str(tmp_path / "compact_tbl")
    orders = load_table(spark, SF_DIR, "orders")
    # 5 published versions, each fragmented into 8 files = 40 small files
    for i in range(5):
        batch = orders.filter(F.col("o_orderkey") % 5 == i).repartition(8)
        publish_append(spark, batch, root)
    before_rows = read_published(spark, root).count()
    before_files = len(glob.glob(f"{root}/v*/part-*.parquet"))
    assert before_files >= 40

    v = compact_published(spark, root, target_files=2)
    after = read_published(spark, root)
    assert after.count() == before_rows == orders.count()
    assert {tuple(r) for r in after.collect()} == {tuple(r) for r in orders.collect()}
    after_files = len(glob.glob(f"{root}/v{v}/part-*.parquet"))
    assert after_files <= 2


def test_vacuum_removes_only_invisible_files(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.wap import (
        compact_published,
        publish_append,
        publish_append_observed,
        read_published,
        vacuum,
    )

    root = str(tmp_path / "vac_tbl")
    orders = load_table(spark, SF_DIR, "orders")
    publish_append(spark, orders.filter(F.col("o_orderkey") % 2 == 0), root)
    publish_append(spark, orders.filter(F.col("o_orderkey") % 2 == 1), root)
    n_before = read_published(spark, root).count()

    # a rejected observed write leaves staging garbage…
    import pytest as _pytest

    with _pytest.raises(ValueError):
        publish_append_observed(
            spark, orders, root, [("n", F.count(F.lit(1)), lambda v: v > 10**9)]
        )
    # …compaction supersedes v1/v2…
    compact_published(spark, root)
    # …vacuum removes both classes, readers see identical data
    removed = vacuum(root)
    assert any("_staging" in p for p in removed) or removed  # staging may auto-clean
    assert {os.path.basename(p) for p in removed} >= {"v1", "v2"}
    assert read_published(spark, root).count() == n_before == orders.count()


def test_upsert_is_idempotent(spark):
    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.merge import upsert

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_orderstatus", F.lit("U")
    )
    once = upsert(updates, orders, ["o_orderkey"])
    twice = upsert(updates, once, ["o_orderkey"])
    assert once.count() == orders.count() == twice.count()
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_salted_asof_equals_unsalted_on_planted_skew(spark):
    """The segmented-scan as-of (salted by time bucket) must produce
    row-identical output to the plain window construction — including a
    celebrity key holding most rows, ts ties (inclusive semantics), keys
    with no right rows, and buckets containing only left rows."""
    import random

    from etl_expenses_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_salted,
    )

    rng = random.Random(13)
    lefts, rights = [], []
    # celebrity key 0: dense timeline; keys 1-5: sparse; key 6: no rights
    for i in range(2000):
        lefts.append((0, float(rng.randrange(0, 100_000)), i))
    for k in range(1, 7):
        for i in range(40):
            lefts.append((k, float(rng.randrange(0, 100_000)), 10_000 + k * 100 + i))
    for t in range(0, 100_000, 500):
        rights.append((0, float(t), f"q0-{t}"))
    for k in range(1, 6):
        for t in range(0, 100_000, 7000):
            rights.append((k, float(t), f"q{k}-{t}"))
    # exact-tie probes: left ts equal to a right ts (inclusive match)
    lefts += [(0, 500.0, 99991), (3, 7000.0, 99992)]

    left = spark.createDataFrame(lefts, ["uid", "ts", "probe_id"])
    right = spark.createDataFrame(rights, ["uid", "ts", "quote"])

    base = asof_join_backward(left, right, "uid", "uid", "ts", "ts", ["quote"])
    a = {tuple(r) for r in base.collect()}
    # three regimes: many buckets, a handful, and one bucket (≡ unsalted)
    for width in (300.0, 10_000.0, 1e9):
        salted = asof_join_backward_salted(
            left, right, "uid", "uid", "ts", "ts", ["quote"], bucket_seconds=width
        )
        b = {tuple(r) for r in salted.collect()}
        assert a == b, (width, sorted(a - b)[:3], sorted(b - a)[:3])
    salted = asof_join_backward_salted(
        left, right, "uid", "uid", "ts", "ts", ["quote"], bucket_seconds=10_000.0
    )
    # tie rows matched inclusively in both
    tie = {r.probe_id: r.quote for r in salted.filter(F.col("probe_id") >= 99991).collect()}
    assert tie == {99991: "q0-500", 99992: "q3-7000"}


def test_detect_hot_keys_full_and_sampled(spark):
    """Planted 40%-hot key is found by the exact pass AND by a 10% sample;
    the uniform long tail never qualifies."""
    from etl_expenses_spark.operators.skew import detect_hot_keys

    rows = [(0,)] * 4000 + [(k,) for k in range(1, 601) for _ in range(10)]
    df = spark.createDataFrame(rows, ["uid"]).repartition(8)
    assert detect_hot_keys(df, "uid", min_share=0.05) == [0]
    assert detect_hot_keys(df, "uid", min_share=0.05, sample_fraction=0.1) == [0]
    assert detect_hot_keys(df.filter("uid < 0"), "uid", min_share=0.05) == []


def test_write_sized_targets_file_size(spark, tmp_path):
    """~20 MB of incompressible data (2×128-hex-char cols × 80k rows) at
    target_mb=2 → ~10 files, each within a loose factor of the target; a
    tiny frame still writes one file."""
    import os

    from pyspark.sql import functions as F

    from etl_expenses_spark.operators.layout import write_sized

    df = spark.range(80_000).select(
        "id",
        F.sha2(F.col("id").cast("string"), 512).alias("a"),
        F.sha2((F.col("id") + 1).cast("string"), 512).alias("b"),
    )
    out = tmp_path / "sized"
    n_files = write_sized(df, str(out), target_mb=2)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n_files and 5 <= n_files <= 20
    sizes = [os.path.getsize(out / f) for f in files]
    for s in sizes:
        assert 0.3 * 2 * 1024 * 1024 < s < 3 * 2 * 1024 * 1024, sizes
    # rows survive exactly
    assert spark.read.parquet(str(out)).count() == 80_000

    small = tmp_path / "small"
    assert write_sized(spark.range(10), str(small), target_mb=256) == 1


def test_read_version_and_history(spark, table_root):
    """Each publish stays individually readable (incremental consumers);
    the manifest lists history in order; a vacuumed superseded version
    stops being readable while the live table is unaffected."""
    from etl_expenses_spark.operators.wap import (
        compact_published,
        publish_append,
        read_published,
        read_version,
        vacuum,
        versions,
    )

    orders = load_table(spark, SF_DIR, "orders")
    a = orders.filter(F.col("o_orderkey") % 3 == 0)
    b = orders.filter(F.col("o_orderkey") % 3 == 1)
    v1 = publish_append(spark, a, table_root)
    v2 = publish_append(spark, b, table_root)
    assert versions(table_root) == [v1, v2]
    assert read_version(spark, table_root, v1).count() == a.count()
    assert read_version(spark, table_root, v2).count() == b.count()

    v3 = compact_published(spark, table_root)
    assert versions(table_root) == [v3]
    # superseded versions remain readable until vacuum
    assert read_version(spark, table_root, v1).count() == a.count()
    vacuum(table_root)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_version(spark, table_root, v1)
    assert read_published(spark, table_root).count() == a.count() + b.count()


def test_concurrent_version_claims_never_collide(tmp_path):
    """Two publishers racing for the next version get DISTINCT versions —
    the O_EXCL claim marker makes the loser bump and retry (ADVICE round 1:
    concurrent writers must not clobber each other's staging dirs)."""
    import threading

    from etl_expenses_spark.operators.wap import _claim_version

    root = str(tmp_path / "t")
    got: list[int] = []
    lock = threading.Lock()

    def claim():
        v, _ = _claim_version(root)
        with lock:
            got.append(v)

    threads = [threading.Thread(target=claim) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(got) == 8
    assert len(set(got)) == 8  # all distinct — no clobbered version dirs


def test_write_bloomed_embeds_filters_and_reads_back(spark, tmp_path):
    """write_bloomed: the bloom bitsets are genuinely IN the files (size
    delta vs the identical bloom-less write — pyarrow does not expose the
    offsets) and point-lookup reads stay correct."""
    import os

    from etl_expenses_spark.operators.layout import write_bloomed

    df = spark.range(200_000).selectExpr(
        "id", "CAST(hash(id) AS STRING) AS lookup_key"
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.coalesce(2).write.parquet(plain)
    write_bloomed(df.coalesce(2), bloomed, ["lookup_key"], expected_ndv=100_000)

    def total(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    # a 100k-ndv bloom bitset is ~100+ KB per file — far above codec noise
    assert total(bloomed) > total(plain) + 50_000

    key = df.filter("id = 123456").collect()[0]["lookup_key"]
    got = (
        spark.read.parquet(bloomed)
        .filter(F.col("lookup_key") == key)
        .collect()
    )
    assert {r["id"] for r in got} == {
        r["id"] for r in df.filter(F.col("lookup_key") == key).collect()
    }


def test_wap_read_as_of_snapshots(spark, tmp_path):
    """Snapshot-log time travel: read_as_of(c) reproduces the table as of
    each commit, survives compaction (pre-compact snapshots resolve to the
    original version dirs), and raises once vacuum removes what an old
    snapshot references."""
    import pytest

    from etl_expenses_spark.operators.wap import (
        compact_published,
        publish_append,
        read_as_of,
        snapshots,
        vacuum,
    )

    root = str(tmp_path / "t")
    d = lambda lo, hi: spark.range(lo, hi).selectExpr("id", "id * 2 AS v")
    c0 = publish_append(spark, d(0, 10), root)
    c1 = publish_append(spark, d(10, 30), root)
    c2 = compact_published(spark, root)
    c3 = publish_append(spark, d(30, 40), root)

    assert {r.id for r in read_as_of(spark, root, c0).collect()} == set(range(10))
    # pre-compaction snapshot still resolves after the manifest swap
    assert {r.id for r in read_as_of(spark, root, c1).collect()} == set(range(30))
    assert {r.id for r in read_as_of(spark, root, c2).collect()} == set(range(30))
    assert {r.id for r in read_as_of(spark, root, c3).collect()} == set(range(40))
    assert set(snapshots(root)) == {c0, c1, c2, c3}
    with pytest.raises(FileNotFoundError):
        read_as_of(spark, root, 999)

    # vacuum drops the superseded pre-compaction dirs -> old snapshots are
    # gone by design, the current state still reads
    vacuum(root)
    with pytest.raises(FileNotFoundError):
        read_as_of(spark, root, c0)
    assert {r.id for r in read_as_of(spark, root, c3).collect()} == set(range(40))


def test_wap_publish_replace_snapshots(spark, tmp_path):
    """publish_replace swaps the CURRENT manifest to the new version only,
    while the snapshot log keeps every prior state readable — merge makes
    a snapshot, never rewrites history."""
    from etl_expenses_spark.operators.wap import (
        publish_append,
        publish_replace,
        read_as_of,
        read_published,
    )

    root = str(tmp_path / "t")
    c0 = publish_append(spark, spark.range(0, 10), root)
    c1 = publish_append(spark, spark.range(10, 20), root)
    merged = read_published(spark, root).selectExpr("id + 100 AS id")
    c2 = publish_replace(spark, merged, root)

    assert {r.id for r in read_published(spark, root).collect()} == set(
        range(100, 120)
    )
    assert {r.id for r in read_as_of(spark, root, c1).collect()} == set(range(20))
    assert {r.id for r in read_as_of(spark, root, c0).collect()} == set(range(10))
    assert {r.id for r in read_as_of(spark, root, c2).collect()} == set(
        range(100, 120)
    )


def test_skew_task_study_section_renders_and_rewrites_idempotently(tmp_path):
    """The straggler-evidence section (VERDICT r12 #5) renders from stored
    JSON and replaces itself in place — regenerating SHUFFLE.md or re-
    running the study never duplicates or drops it."""
    import sys

    sys.path.insert(0, "tools")
    import skew_task_study as sts

    data = {
        "fact_rows": 100, "hot_share_pct": 40, "salt_buckets": 16,
        "asof_bucket_seconds": 604800.0,
        "arms": [
            {"arm": "join_plain", "wall_s": 9.0,
             "worst_stage": {"stage": 1, "tasks": 32, "p50_s": 2.0,
                             "p99_s": 8.0, "max_s": 8.0, "ratio": 4.0,
                             "shuffle_read_mb": 100.0},
             "stages": []},
            {"arm": "join_salted", "wall_s": 4.0, "worst_stage": None,
             "stages": []},
        ],
        "verdict": "test verdict sentinel",
    }
    sec = sts.render_section(data)
    assert sts.SECTION_MARK in sec and "test verdict sentinel" in sec
    assert "| join_plain | 9.0 | 32 |" in sec
    assert "| join_salted | 4.0 | — |" in sec  # missing stage degrades to —

    md = tmp_path / "SHUFFLE.md"
    md.write_text("# SHUFFLE.md\n\nbody\n")
    orig_repo = sts.REPO
    try:
        sts.REPO = str(tmp_path)
        sts.rewrite_shuffle_md(data)
        once = md.read_text()
        sts.rewrite_shuffle_md(data)
        twice = md.read_text()
    finally:
        sts.REPO = orig_repo
    assert once == twice  # idempotent replace, not append
    assert once.count(sts.SECTION_MARK) == 1 and "body" in once
