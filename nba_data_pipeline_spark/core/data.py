"""Testdata loaders: typed parquet reads with timestamp normalization.

The driver's synthetic tables (TESTDATA.md) are plain parquet; one
quirk: ``events.ts`` is written as TIMESTAMP(NANOS), which Spark reads
only as a nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``).
``load_table`` converts any such column to a true TimestampType at
microsecond precision (floor division — identical to DuckDB's ns->us
truncation, so oracle comparisons agree).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
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

# columns stored as TIMESTAMP(NANOS) in the testdata parquet
_NANOS_COLS = {"events": ("ts",)}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) in ("bigint", "long"):
            # integer `div`, not `/`: float division of epoch-nanos loses
            # ulps and shifts some values by 1 microsecond
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
