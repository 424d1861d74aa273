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


HEAVY_HITTERS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("count_lb", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)
HEAVY_HITTERS_STATE = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def make_heavy_hitters_fn(capacity: int):
    """Per-key Misra-Gries heavy-hitter summary across micro-batches.

    State is the classic bounded counter map (at most ``capacity``
    entries): new tokens are merged by their batch counts (pandas
    ``value_counts`` — no per-row Python loop); when the map exceeds
    capacity, the (capacity+1)-th largest count is subtracted from
    every entry and non-positive entries drop — the batched MG
    decrement of Agarwal et al., "Mergeable Summaries" (PODS'12).
    Guarantees: every reported count is a LOWER bound within
    n_seen/(capacity+1) of the true count, and any token with true
    frequency > n_seen/(capacity+1) is present in the summary — the
    streaming twin of ``operators.sketches.heavy_hitters``, with
    O(capacity) state per key instead of an exact (key, token) agg.

    On a FLAT distribution (every true count <= n/(capacity+1)) the
    decrement can legitimately empty the summary — that is within the
    MG bound, not a bug. An empty summary still emits ONE marker row
    (token NULL, count_lb 0) so the sink observes n_seen every batch;
    without it a downstream 'latest state' read silently goes stale
    (found by a multi-batch drive on real flat-ish data — the pytest
    gate's planted-heavy-token corpus never triggered it). Consumers
    filter ``token IS NOT NULL`` for summary rows.
    """

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            tokens, counts, n_seen = state.get
            mg = dict(zip(tokens, counts))
        else:
            mg, n_seen = {}, 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            n_seen += int(vc.sum())
            for tok, c in vc.items():
                mg[tok] = mg.get(tok, 0) + int(c)
            if len(mg) > capacity:
                m = sorted(mg.values(), reverse=True)[capacity]
                mg = {t: c - m for t, c in mg.items() if c > m}
        toks = sorted(mg)
        state.update((toks, [mg[t] for t in toks], n_seen))
        if toks:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(toks),
                    "token": toks,
                    "count_lb": [mg[t] for t in toks],
                    "n_seen": [n_seen] * len(toks),
                }
            )
        else:
            yield pd.DataFrame(
                {"key": [key[0]], "token": [None], "count_lb": [0],
                 "n_seen": [n_seen]}
            )

    return fn


def stream_heavy_hitters(
    spark: SparkSession,
    parquet_dir: str,
    schema: T.StructType,
    key_col: str,
    token_col: str,
    capacity: int = 20,
    query_name: str = "heavy_hitters_stream",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming per-key Misra-Gries heavy hitters with explicit keyed
    state: bounded O(capacity) memory per key no matter how many
    distinct tokens stream through — the shape that survives an
    unbounded vocabulary where an exact streaming (key, token)
    aggregate would grow state without limit. Emits the full summary
    per key per micro-batch (update mode); drained synchronously
    through a memory sink for tests, production swaps sink/trigger."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(parquet_dir)
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(token_col).cast("string").alias("token"),
    ).groupBy("key")
    out = keyed.applyInPandasWithState(
        make_heavy_hitters_fn(capacity),
        outputStructType=HEAVY_HITTERS_OUTPUT,
        stateStructType=HEAVY_HITTERS_STATE,
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
