from data_validator_spark.sources.tables import (  # noqa: F401
    TESTDATA_TABLES,
    append_sentinel_row,
    load_table,
    load_tables,
)
