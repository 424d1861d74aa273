"""Streaming pipeline operators: bounded-state dedup and stream-static
enrichment.

The reference has no streaming surface (SURVEY.md §2.7); these are the
two stream-side operators an ingest pipeline at scale needs beyond
windowed aggregation: exact dedup of re-delivered events with state the
engine can reclaim, and enriching a stream against a slowly-changing
dimension without shuffling the stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_dedup(stream: DataFrame, ts_col: str, watermark: str, key_cols: Sequence[str]) -> DataFrame:
    """Exact dedup on a stream with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` drops any duplicate key arriving
    within the watermark horizon and reclaims the key's state once the
    watermark passes it. Plain ``dropDuplicates`` on a stream keeps
    every key forever — the classic streaming state OOM; this is the
    scale-safe form (at-least-once upstream delivery -> effectively-once
    downstream).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, on: Sequence[str] | str, how: str = "left") -> DataFrame:
    """Stream-static join: attach dimension attributes to each event.
    The static side is explicitly broadcast, so each micro-batch maps
    over the stream partitions with no stream-side shuffle — the
    streaming analogue of the reference's driving-dimension lookups.
    """
    on = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), on=on, how=how)


def run_stream_dedup(
    spark: SparkSession,
    parquet_dir: str,
    schema: T.StructType,
    ts_col: str,
    watermark: str,
    key_cols: Sequence[str],
    query_name: str = "dedup_stream",
) -> DataFrame:
    """Drain helper: readStream over a parquet dir -> stream_dedup ->
    memory sink, processed to completion (test/backfill shape; swap the
    sink for production)."""
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    deduped = stream_dedup(stream, ts_col, watermark, key_cols)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
