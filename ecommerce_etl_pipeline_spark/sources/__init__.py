"""Sources & sinks (SURVEY.md §2.1, S1-S11)."""

from ecommerce_etl_pipeline_spark.sources.io import (  # noqa: F401
    TESTDATA_TABLES,
    load_all,
    load_table,
    read_csv,
    read_json,
    upsert_append,
    write_csv,
    write_json,
    write_table,
)
