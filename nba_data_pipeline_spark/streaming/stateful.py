"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.7); this provides
the custom-stateful-operator surface a Spark-native pipeline uses when
built-in windowed aggregates can't express the state machine (e.g. a
live lineup tracker fed by a play-by-play stream — the streaming twin
of ``operators.lineups.track_lineups``).

State is kept per group key by the engine (checkpointed, fault
tolerant); the user function sees Arrow batches for the key plus a
typed GroupState handle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Per-key running (sum, count) across micro-batches."""
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in batches:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame({"key": [key[0]], "total": [round(total, 6)], "n": [n]})


RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)
RUNNING_TOTALS_STATE = T.StructType(
    [T.StructField("total", T.DoubleType()), T.StructField("n", T.LongType())]
)


def stream_running_totals(
    spark: SparkSession,
    parquet_dir: str,
    schema: T.StructType,
    key_col: str,
    value_col: str,
    query_name: str = "running_totals",
) -> DataFrame:
    """Streaming per-key running totals with explicit keyed state.

    Reads a parquet directory as a stream, maintains (sum, count) per
    key in GroupState, emits one update row per key per micro-batch.
    Drained synchronously through a memory sink for tests; production
    swaps sink/trigger and gets checkpointed exactly-once state.
    """
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    keyed = stream.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("value")
    ).groupBy("key")
    out = keyed.applyInPandasWithState(
        running_totals_fn,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
