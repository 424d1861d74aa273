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
    """Replace ``path`` with ``merged`` wholesale (write-temp-then-swap;
    local-fs stand-in for a table-format transaction commit). Used for
    unpartitioned tables; partitioned merges go through
    ``_rewrite_partitions`` and touch only affected partition dirs."""
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


def _rewrite_partitions(
    spark: SparkSession, merged: DataFrame, path: str, partition_by: Sequence[str]
) -> None:
    """Swap only the partition directories present in ``merged`` — the
    dynamic-partition-overwrite shape: write merged (already filtered to
    affected partitions) to a temp dir, then move each leaf partition
    dir over its target counterpart. Unaffected partitions are never
    read or rewritten, so a merge costs O(changed partitions), not
    O(table)."""
    depth = len(partition_by)
    tmp = tempfile.mkdtemp(prefix="upsert_", dir=os.path.dirname(path.rstrip("/")) or ".")
    try:
        # the write is itself the materializing action; an empty merged
        # frame (e.g. a delta re-run with nothing new) produces zero
        # partition dirs and the loop below swaps nothing
        write_table(merged, tmp, partition_by, mode="overwrite")
        # walk HIVE-style partition dirs exactly `depth` levels deep
        leaves: list[str] = []

        def walk(d: str, level: int) -> None:
            if level == depth:
                leaves.append(os.path.relpath(d, tmp))
                return
            for name in os.listdir(d):
                sub = os.path.join(d, name)
                if os.path.isdir(sub) and "=" in name:
                    walk(sub, level + 1)

        walk(tmp, 0)
        for rel in leaves:
            dst = os.path.join(path, rel)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(os.path.join(tmp, rel), dst)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _merge_partitioned(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    key: str | Sequence[str],
    partition_by: Sequence[str],
    combine,
) -> None:
    """Shared partition-scoped merge: only target rows in partitions that
    received source rows participate (left-semi on the broadcast distinct
    partition tuples — at scale this is partition pruning, not a scan).

    Invariant: partition columns must be stable for a given key (true for
    the reference layout — SEASON/SEASON_TYPE derive from GAME_ID). A key
    whose partition changed would leave its old copy untouched."""
    target = read_table(spark, path).select(source.columns)
    src_parts = source.select(*partition_by).distinct()
    affected = target.join(F.broadcast(src_parts), list(partition_by), "left_semi")
    merged = combine(affected, source, key)
    _rewrite_partitions(spark, merged, path, partition_by)


def upsert_table(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    key: str | Sequence[str],
    partition_by: Sequence[str] = (),
) -> None:
    """MERGE: source rows win on key collision; first write creates the
    table (reference create-on-first-write, db_client.py:43-54).
    Partitioned tables rewrite only the partitions receiving source rows."""
    if not os.path.exists(path):
        write_table(source, path, partition_by)
        return
    if partition_by:
        _merge_partitioned(spark, source, path, key, partition_by, merge_upsert)
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
    if partition_by:
        _merge_partitioned(spark, source, path, key, partition_by, insert_ignore)
        return
    target = read_table(spark, path).select(source.columns)
    merged = insert_ignore(target, source, key)
    _rewrite(spark, merged, path, partition_by)


def write_csv_golden(df: DataFrame, path: str) -> None:
    """Golden-sample CSV sink (reference test.py:15 writes
    game_rotation.csv). Single file for diffability."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
