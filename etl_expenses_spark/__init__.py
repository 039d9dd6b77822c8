"""etl_expenses_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference ETL (abettucci/etl-expenses, surveyed in SURVEY.md), re-designed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, columnar
execution via Tungsten, Arrow-batched pandas UDFs only where parsing demands
it, and Structured Streaming for the event-driven paths.

Layout:
    session       SparkSession builder with scale-tuned confs
    schemas       StructTypes for the gold tables + testdata tables
    functions/    pure-Column expression library (money, dates, ids, text)
    sources/      readers (csv/json/parquet/binary), catalog registration
    operators/    merge (idempotent anti-join append), dedup, similarity,
                  as-of join — the engine's composite operators
    plans/        the oracle-checked query inventory (SURVEY.md §2)
    streaming/    Structured Streaming variants (file-source micro-batch)
    parsers       PDF/HTML parser UDTFs (the only non-relational logic)
    pipelines     the three reference ETL flows as Spark batch jobs
"""

__version__ = "0.1.0"
