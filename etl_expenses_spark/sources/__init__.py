from etl_expenses_spark.sources.readers import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json_docs,
    register_views,
)
