"""Event-time windowed aggregation — batch and streaming surfaces.

The reference has no streaming operators (SURVEY.md §2.7); its
incremental "delta mode" maps to batch anti-join + upsert. This module
adds the event-time window surface a pipeline at scale actually needs:
tumbling/sliding aggregates usable identically on a batch DataFrame or
a stream (same ``F.window`` expression), plus a Structured Streaming
wrapper with watermarking for late data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str] = (),
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Tumbling event-time windows. ``aggs`` maps output name ->
    aggregate expr string (e.g. {'n': 'count(*)', 'v': 'sum(value)'}).
    Windows align to the epoch, so results match a
    ``date_trunc``-style oracle exactly."""
    aggs = aggs or {"n": "count(*)"}
    agg_cols = [F.expr(expr).alias(name) for name, expr in aggs.items()]
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *group_cols)
        .agg(*agg_cols)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            *[F.col(name) for name in aggs],
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str] = (),
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Sliding windows: each event contributes to duration/slide
    overlapping windows (Spark expands this internally — no explode
    needed)."""
    aggs = aggs or {"n": "count(*)"}
    agg_cols = [F.expr(expr).alias(name) for name, expr in aggs.items()]
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), *group_cols)
        .agg(*agg_cols)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            *[F.col(name) for name in aggs],
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str] = (),
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Event-time session windows (``F.session_window``): a session
    extends while successive events arrive within ``gap``; the window
    closes at last_event + gap. Works identically on batch frames and
    streams; the relational batch analogue is
    ``operators.windows.sessionize`` (gaps-and-islands), cross-checked
    in tests."""
    aggs = aggs or {"n": "count(*)"}
    agg_cols = [F.expr(expr).alias(name) for name, expr in aggs.items()]
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *group_cols)
        .agg(*agg_cols)
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            *[F.col(name) for name in aggs],
        )
    )


def stream_session_counts(
    spark: SparkSession,
    parquet_dir: str,
    schema: T.StructType,
    ts_col: str,
    gap: str,
    watermark: str,
    group_cols: Sequence[str] = (),
    query_name: str = "session_counts",
) -> DataFrame:
    """Structured Streaming session windows: watermarked
    ``session_window`` aggregation — sessions merge as events arrive
    and finalize once the watermark passes session end. State per open
    session only, so memory is bounded by active users, not history.
    Memory sink drained synchronously for tests; swap sink/trigger for
    production.

    Spark rejects GLOBAL session aggregation on streams (sessions must
    key on something to shard state), so ``group_cols`` is required
    here — validated eagerly rather than as an opaque stream failure."""
    if not group_cols:
        raise ValueError(
            "stream_session_counts requires at least one group column: "
            "streaming session windows cannot be a global aggregation"
        )
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            F.col("n"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_tumbling_counts(
    spark: SparkSession,
    parquet_dir: str,
    schema: T.StructType,
    ts_col: str,
    duration: str,
    watermark: str,
    group_cols: Sequence[str] = (),
    query_name: str = "windowed_counts",
) -> DataFrame:
    """Structured Streaming version: readStream over a parquet dir,
    watermark for late data, tumbling count, memory sink drained
    synchronously (``Trigger.AvailableNow`` semantics for tests; swap
    the sink/trigger for production).

    Returns the materialized result as a batch DataFrame.
    """
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"), *group_cols, F.col("n")
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
