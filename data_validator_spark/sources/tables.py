"""Table sources + export-side schema guarantees.

Scans are plain `spark.read.parquet` (Iceberg in production — the S1
paginated-cursor machinery of the reference disappears entirely;
Catalyst handles predicate pushdown and column pruning,
SURVEY.md §2.1).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


# plain python values: F.lit at module import would need a live session
_SENTINELS = {
    T.StringType(): "schema_row",
    T.IntegerType(): 0,
    T.LongType(): 0,
    T.DoubleType(): 0.0001,
    T.FloatType(): 0.0001,
    T.BooleanType(): False,
}


def append_sentinel_row(df: DataFrame, now: dt.datetime | None = None) -> DataFrame:
    """Append one synthetic row carrying a typed value for every column
    so downstream loaders always infer the full schema — the
    reference's schema sentinel rows (utils.py:479-543,
    core_models.py:922-982: str->'schema_row', int->0, float->0.0001,
    bool->False, datetime->now)."""
    now = now or dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            c = F.lit(now)
        elif isinstance(f.dataType, T.DateType):
            c = F.lit(now.date())
        else:
            c = F.lit(_SENTINELS.get(f.dataType))
        cols.append(c.cast(f.dataType).alias(f.name))
    sentinel = df.sparkSession.range(1).select(*cols)
    return df.unionByName(sentinel)
