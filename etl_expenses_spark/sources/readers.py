"""Typed readers for the engine's sources (SURVEY.md §2.1).

The reference pulls from S3 objects (CSV ';', XLSX, JSON mail docs, raw PDF
bytes — `/root/reference/load_data/lambda_function.py:274-276`,
`transform_data_mp/lambda_function.py:52-62`,
`transform_data_bank_pay/lambda_function.py:80-81`). Here every source is a
declarative ``spark.read`` so Catalyst sees the schema and can push filters
and prune columns down to the scan; directory-listing + suffix filtering
(S5) is expressed as path globs and ``binaryFile`` metadata predicates
rather than imperative loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-provided synthetic tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata parquet table.

    Parquet scan → columnar vectorized reader, min/max stat pruning and
    predicate pushdown are automatic once filters are declared on the result.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects; we read nanos as long and truncate to microseconds —
    the same truncation DuckDB's reader applies, so both engines see
    identical values.
    """
    # Engine semantics are pinned to UTC and must hold even on a caller's
    # vanilla session (the driver constructs its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f_ in df.schema.fields:
        if f_.name == "ts" and f_.dataType.typeName() in ("long", "bigint"):
            # integer div — float division would lose precision above 2^53 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all testdata tables to the SQL surface (`spark.sql`).

    This is the engine's catalog feed — the analog of the reference's Glue
    crawler + ``get_tables`` schema read-back
    (`/root/reference/ai_agent/lambda_function.py:22-36`), except schemas are
    transactionally known from parquet footers instead of crawled.
    """
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV scan (S1) incl. the ';' dialect used by MP settlement reports
    (`/root/reference/transform_data_mp/lambda_function.py:52`)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json_docs(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """One-JSON-document-per-file scan (S3), the bank-mail layout
    (`/root/reference/transform_data_bank_pay/lambda_function.py:80-81`)."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """Excel scan (S2) — the MP settlement XLSX variant
    (`/root/reference/transform_data_mp/lambda_function.py:62`,
    `load_data/lambda_function.py:276`).

    Spark has no core XLSX reader; the scalable recipe is ingest-time
    conversion: pandas parses the (small) workbook once, the result lands as
    parquet bronze, and everything downstream is columnar. Requires
    openpyxl, which this container doesn't ship — the call is gated so the
    API surface exists and fails with a clear remedy.
    """
    try:
        import openpyxl  # noqa: F401
        import pandas as _pd
    except ImportError as e:  # pragma: no cover - container has no openpyxl
        raise NotImplementedError(
            "XLSX ingestion needs openpyxl (not in this container). "
            "Convert the workbook to CSV/parquet at ingest, or install "
            "openpyxl and re-call."
        ) from e
    pdf = _pd.read_excel(path, sheet_name=sheet)  # pragma: no cover
    return spark.createDataFrame(pdf)  # pragma: no cover


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary scan (S4) for PDF-like payloads: columns
    (path, modificationTime, length, content). Suffix/size predicates (P3)
    are then plain filters on this metadata."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
