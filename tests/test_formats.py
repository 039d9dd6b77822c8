"""Storage-format parity (SURVEY.md §2.1 S1-S3 / §2.2 sinks): the engine
reads and writes parquet (gold standard), ORC, CSV (incl. ';' dialect), and
JSON with full schema + value fidelity. The reference round-trips CSV/XLSX
through S3 (`/root/reference/transform_data_mp/lambda_function.py:52-62`);
here every format goes through a typed write→read cycle and must come back
bit-identical."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from etl_expenses_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmp():
    root = Path(tempfile.mkdtemp(prefix="formats_"))
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _orders(spark):
    return load_table(spark, SF_DIR, "orders")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_zstd_roundtrip(spark, tmp):
    o = _orders(spark)
    path = str(tmp / "orders_zstd")
    o.write.option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    assert back.schema == o.schema
    assert _rows(back) == _rows(o)


def test_orc_roundtrip(spark, tmp):
    o = _orders(spark)
    path = str(tmp / "orders_orc")
    o.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == o.schema
    assert _rows(back) == _rows(o)


def test_csv_semicolon_roundtrip_with_declared_schema(spark, tmp):
    o = _orders(spark)
    path = str(tmp / "orders_csv")
    (
        o.write.option("header", True)
        .option("sep", ";")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )
    back = (
        spark.read.schema(o.schema)
        .option("header", True)
        .option("sep", ";")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )
    assert back.schema == o.schema
    assert _rows(back) == _rows(o)


def test_json_roundtrip_with_declared_schema(spark, tmp):
    o = _orders(spark)
    path = str(tmp / "orders_json")
    o.write.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").json(path)
    back = (
        spark.read.schema(o.schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .json(path)
    )
    assert back.schema == o.schema
    assert _rows(back) == _rows(o)


def test_csv_inferred_schema_matches_cascade(spark, tmp):
    """Header-only CSV read with inferSchema reproduces the numeric/
    timestamp/string cascade (S1 + schema mode 2)."""
    o = _orders(spark).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    path = str(tmp / "orders_infer")
    o.write.option("header", True).csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    got = {f.name: f.dataType.simpleString() for f in back.schema.fields}
    assert got["o_orderkey"] in ("int", "bigint")  # narrowest integral that fits
    assert got["o_totalprice"] == "double"
    assert got["o_orderstatus"] == "string"
    assert got["o_orderdate"].startswith("timestamp")
    assert back.count() == o.count()


def test_csv_permissive_mode_captures_corrupt_rows(spark, tmp):
    """S1 robustness: malformed CSV rows must not kill the job NOR vanish
    silently — PERMISSIVE mode nulls the bad fields and captures the raw
    line in _corrupt_record for the quarantine flow (the reference's
    runtime gates drop bad rows with no audit trail)."""
    path = tmp / "dirty.csv"
    path.write_text(
        "id;amount;when\n"
        "1;10.50;2024-01-01T00:00:00\n"
        "2;NOT_A_NUMBER;2024-01-02T00:00:00\n"
        "3;30.25;ALSO_NOT_A_DATE\n"
        "4;40.00;2024-01-04T00:00:00\n"
    )
    schema = (
        "id BIGINT, amount DOUBLE, `when` TIMESTAMP, _corrupt_record STRING"
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("sep", ";")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(path))
        .cache()
    )
    assert df.count() == 4
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 2
    assert {r.id for r in bad.collect()} == {2, 3}
    good = df.filter(F.col("_corrupt_record").isNull())
    assert {r.id for r in good.collect()} == {1, 4}
    # FAILFAST is the other contract: the same file must raise
    import pytest as _pytest

    with _pytest.raises(Exception):
        (
            spark.read.schema("id BIGINT, amount DOUBLE, `when` TIMESTAMP")
            .option("header", True)
            .option("sep", ";")
            .option("mode", "FAILFAST")
            .csv(str(path))
            .collect()
        )


def test_jsonl_sink_atomic_write_and_abort(spark, tmp_path):
    """Custom Python data-sink (Spark 4 writer API): staged task files
    become visible only at commit (with _SUCCESS manifest + part files),
    append continues numbering, overwrite replaces, and a failing job
    leaves the target untouched."""
    import json
    import os

    import pytest

    from etl_expenses_spark.sources.jsonl_sink import register
    from etl_expenses_spark.sources.readers import load_table

    register(spark)
    out = tmp_path / "export"
    out.mkdir()
    orders = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )
    orders.repartition(4).write.format("jsonl_sink").option(
        "path", str(out)
    ).mode("append").save()

    manifest = json.loads((out / "_SUCCESS").read_text())
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert manifest["rows"] == 100 and manifest["files"] == len(parts) == 4
    assert not (out / "_staging").exists()

    back = spark.read.json(str(out))
    assert back.count() == 100
    assert set(back.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}

    # append: part numbering continues, rows accumulate
    orders.limit(10).repartition(1).write.format("jsonl_sink").option(
        "path", str(out)
    ).mode("append").save()
    assert spark.read.json(str(out)).count() == 110
    assert len([f for f in os.listdir(out) if f.startswith("part-")]) == 5

    # overwrite: replaces everything
    orders.limit(7).repartition(1).write.format("jsonl_sink").option(
        "path", str(out)
    ).mode("overwrite").save()
    assert spark.read.json(str(out)).count() == 7

    # abort: a poison partition fails the job; target is untouched
    from pyspark.sql import functions as F

    poison = orders.withColumn("boom", F.udf(lambda k: 1 // 0)("o_orderkey"))
    with pytest.raises(Exception):
        poison.write.format("jsonl_sink").option("path", str(out)).mode(
            "append"
        ).save()
    assert spark.read.json(str(out)).count() == 7
    assert not (out / "_staging").exists() or not os.listdir(out / "_staging")


def test_parquet_corrupt_file_quarantine_via_ignore_corrupt(spark, tmp):
    """A garbage .parquet file in a landing dir: default read FAILS (no
    silent data loss), and the explicit ignoreCorruptFiles opt-in skips it
    while keeping every good row — the parquet analog of the CSV
    PERMISSIVE/_corrupt_record quarantine contract."""
    import pytest as _pytest

    d = tmp / "landing"
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(str(d))
    (d / "garbage.parquet").write_bytes(b"PAR1 this is not a real parquet file")

    with _pytest.raises(Exception):
        spark.read.parquet(str(d)).count()

    # ignoreCorruptFiles governs the DATA read; schema inference would
    # still trip on the bad footer, so a landing read declares its schema
    # (the bronze contract anyway) and lets the option skip the garbage
    good = (
        spark.read.schema("id BIGINT, v BIGINT")
        .option("ignoreCorruptFiles", "true")
        .parquet(str(d))
    )
    assert good.count() == 100


def test_jsonl_stream_sink_exactly_once(spark, tmp_path):
    """Spark-4 Python DataSourceStreamWriter: each micro-batch publishes
    under the _batches.json epoch ledger — rows land exactly once across
    incremental delivery, a same-checkpoint restart, and a replayed
    commit for an already-committed epoch."""
    import json as _json
    import os

    from etl_expenses_spark.sources.jsonl_sink import (
        JsonlCommit,
        JsonlStreamWriter,
        register,
    )

    register(spark)
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)
    df = spark.range(300).selectExpr("id", "CAST(id AS STRING) AS s")
    df.repartition(3).write.parquet(bronze)

    def run():
        (
            spark.readStream.schema("id long, s string")
            .option("maxFilesPerTrigger", 1)
            .parquet(bronze)
            .writeStream.format("jsonl_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()

    def read_rows():
        rows = []
        for f in sorted(os.listdir(out)):
            if f.startswith("part-") and f.endswith(".jsonl"):
                with open(os.path.join(out, f)) as fh:
                    rows += [_json.loads(line) for line in fh]
        return rows

    rows = read_rows()
    assert len(rows) == 300
    assert {r["id"] for r in rows} == set(range(300))
    with open(os.path.join(out, "_batches.json")) as f:
        led = _json.load(f)
    assert led["rows"] == 300 and len(led["committed"]) >= 3

    # same-checkpoint restart: no new files -> nothing published twice
    run()
    assert len(read_rows()) == 300

    # replayed commit for an ALREADY-COMMITTED epoch: the ledger drops the
    # staged duplicate instead of publishing a second copy
    w = JsonlStreamWriter({"path": out})
    staged = os.path.join(out, "_staging", "replay.jsonl")
    os.makedirs(os.path.dirname(staged), exist_ok=True)
    with open(staged, "w") as f:
        f.write('{"id": 999999}\n')
    w.commit([JsonlCommit(staged=staged, rows=1)], batchId=led["committed"][0])
    assert len(read_rows()) == 300  # unchanged
    assert not os.path.exists(staged)  # staged duplicate swept


def test_jsonl_stream_sink_torn_commit_replay_replaces_orphans(spark, tmp_path):
    """ADVICE r7: a crash mid-rename can publish SOME part-<batch>-*.jsonl
    files of an uncommitted epoch; if the replayed batch produces fewer
    commit messages, the higher-index orphans of the torn attempt must not
    stay visible (rows the ledger never counted). The replay removes every
    part file of the uncommitted epoch before publishing."""
    import json as _json
    import os

    from etl_expenses_spark.sources.jsonl_sink import JsonlCommit, JsonlStreamWriter

    out = str(tmp_path / "out")
    os.makedirs(out)
    w = JsonlStreamWriter({"path": out})

    # batch 0 commits normally
    def stage(name, payload):
        p = os.path.join(out, "_staging", name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(payload)
        return p

    s0 = stage("b0.jsonl", '{"id": 1}\n')
    w.commit([JsonlCommit(staged=s0, rows=1)], batchId=0)

    # torn attempt for batch 1: three files already renamed in, then crash
    # (ledger never updated — batch 1 is NOT committed)
    for i in range(3):
        with open(os.path.join(out, f"part-00001-{i:05d}.jsonl"), "w") as f:
            f.write(f'{{"id": {100 + i}}}\n')

    # replay of batch 1 produces only ONE message
    s1 = stage("b1.jsonl", '{"id": 200}\n')
    w.commit([JsonlCommit(staged=s1, rows=1)], batchId=1)

    part1 = sorted(
        f for f in os.listdir(out)
        if f.startswith("part-00001-") and f.endswith(".jsonl")
    )
    assert part1 == ["part-00001-00000.jsonl"]  # orphans fully replaced
    with open(os.path.join(out, "part-00001-00000.jsonl")) as f:
        assert _json.loads(f.read()) == {"id": 200}
    with open(os.path.join(out, "_batches.json")) as f:
        led = _json.load(f)
    # ledger row count == rows actually visible
    visible = sum(
        1
        for f in os.listdir(out)
        if f.startswith("part-") and f.endswith(".jsonl")
        for _ in open(os.path.join(out, f))
    )
    assert led["rows"] == visible == 2
