"""Streaming incremental-merge sink: the reference's "delta mode +
upsert" (J1 + S7) as a Structured Streaming façade.

``foreachBatch`` gives each micro-batch as a normal DataFrame, merged
into the target table with the same MERGE-shaped writer the batch path
uses — checkpointing makes re-delivered batches idempotent (upsert on
the key), which is the exactly-once-ish contract the reference gets
from ON CONFLICT DO UPDATE (``database/db_client.py:69-90``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..sinks.snapshot import upsert_snapshot
from ..sinks.writer import upsert_table


def stream_upsert(
    stream_df: DataFrame,
    path: str,
    key: str | Sequence[str],
    partition_by: Sequence[str] = (),
    checkpoint_dir: str | None = None,
    query_name: str = "stream_upsert",
    available_now: bool = True,
):
    """Start a streaming query that MERGEs every micro-batch into the
    parquet table at ``path``. ``available_now=True`` drains what's
    currently available and stops scheduling new triggers (incremental
    batch semantics — run it on a cron like the reference's CLI)."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        upsert_table(spark, batch_df, path, key, partition_by)

    writer = stream_df.writeStream.foreachBatch(merge_batch).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_snapshot(
    stream_df: DataFrame,
    root: str,
    key: str | Sequence[str],
    app_id: str,
    checkpoint_dir: str | None = None,
    query_name: str = "stream_upsert_snapshot",
    available_now: bool = True,
):
    """Exactly-once streaming MERGE into a manifest-committed snapshot
    table (``sinks/snapshot.py``). foreachBatch is at-least-once —
    after a crash between the sink write and the checkpoint commit,
    Structured Streaming REDELIVERS the epoch — so the plain
    ``stream_upsert`` is only idempotent when re-merging identical
    rows happens to converge. This sink is idempotent BY PROTOCOL:
    every micro-batch commits with ``txn=(app_id, epoch_id)`` and the
    manifest's transaction watermark makes any replayed epoch a
    visible no-op (the public Delta txnAppId/txnVersion design). The
    commit itself is a single atomic link, so a crash can never leave
    a half-merged table for the retry to trip over.

    ``checkpoint_dir`` is REQUIRED: without a durable checkpoint every
    run restarts epoch_id at 0, and the (app_id, epoch) watermark left
    by a prior run fences each new batch as an already-applied replay —
    data is silently dropped (ADVICE r13, medium). The watermark's
    lifetime is the checkpoint's lifetime; reuse an app_id only with
    its checkpoint, or pick a fresh app_id for a fresh checkpoint."""
    if not checkpoint_dir:
        raise ValueError(
            "stream_upsert_snapshot requires checkpoint_dir: the "
            "(app_id, epoch) txn fence outlives a temp checkpoint, so "
            "a re-run without one silently drops every batch as a "
            "replay. Pass a durable checkpoint_dir (and keep app_id "
            "paired with it), or use a fresh app_id per run."
        )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        upsert_snapshot(spark, batch_df, root, key, txn=(app_id, int(epoch_id)))

    writer = stream_df.writeStream.foreachBatch(merge_batch).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_incremental_merge(
    spark: SparkSession,
    source_dir: str,
    schema,
    path: str,
    key: str | Sequence[str],
    partition_by: Sequence[str] = (),
    checkpoint_dir: str | None = None,
) -> None:
    """One AvailableNow incremental pass: read whatever new files landed
    in ``source_dir`` (per the checkpoint), upsert them, stop."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = stream_upsert(
        stream, path, key, partition_by, checkpoint_dir, query_name="incr_merge"
    )
    q.awaitTermination()
