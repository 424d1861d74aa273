"""Spark-catalog table management: databases, managed tables, bucketing.

Replaces the reference's DB bootstrap + DDL layer
(``database/db_init.py:7-20`` CREATE DATABASE; ``database/db_client.py:43-54``
create-on-first-write): a Spark database + ``saveAsTable``. Bucketing
is the co-location feature Postgres indexes can't give you — a table
bucketed by GAME_ID joins other GAME_ID-bucketed tables with NO
shuffle, which is the difference between one wide exchange and none on
every per-game derived pipeline at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str | None = None) -> None:
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}")


def save_table(
    df: DataFrame,
    name: str,
    partition_by: Sequence[str] = (),
    bucket_by: tuple[int, Sequence[str]] | None = None,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Managed catalog table; optional partitioning + bucketing.

    ``bucket_by=(n, cols)`` hash-buckets rows so equi-joins/aggs on
    ``cols`` between same-bucketed tables skip the shuffle entirely;
    ``sort_by`` makes each bucket file internally ordered (sort-merge
    join without the sort)."""
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols)
        if sort_by:
            writer = writer.sortBy(*sort_by)
    writer.saveAsTable(name)


def table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def register_temp_views(spark: SparkSession, frames: dict[str, DataFrame]) -> None:
    """Expose DataFrames to the SQL surface (spark.sql over the same
    Catalyst plans)."""
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
