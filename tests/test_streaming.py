import datetime as dt

from pyspark.sql import functions as F, types as T

from nba_data_pipeline_spark.streaming.windows import (
    sliding_agg,
    stream_tumbling_counts,
    tumbling_agg,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _df(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0 + dt.timedelta(minutes=5), 1.0),
        (2, t0 + dt.timedelta(minutes=40), 2.0),
        (3, t0 + dt.timedelta(minutes=70), 4.0),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_tumbling_agg(spark):
    out = tumbling_agg(_df(spark), "ts", "1 hour", aggs={"n": "count(*)", "s": "sum(v)"})
    got = {r.window_start.minute + r.window_start.hour * 60: (r.n, r.s) for r in out.collect()}
    assert got == {0: (2, 3.0), 60: (1, 4.0)}


def test_sliding_agg_events_land_in_two_windows(spark):
    out = sliding_agg(_df(spark), "ts", "1 hour", "30 minutes", aggs={"n": "count(*)"})
    # event at :05 -> windows starting 23:30(prev day) and 00:00; total window rows:
    n_total = sum(r.n for r in out.collect())
    assert n_total == 6  # each of 3 events appears in exactly 2 windows


def test_structured_streaming_matches_batch(spark, tmp_path):
    path = str(tmp_path / "stream_src")
    _df(spark).write.mode("overwrite").parquet(path)
    result = stream_tumbling_counts(
        spark, path, SCHEMA, "ts", "1 hour", watermark="10 minutes", query_name="t_stream"
    )
    got = {r.window_start: r.n for r in result.collect()}
    batch = tumbling_agg(spark.read.parquet(path), "ts", "1 hour")
    expected = {r.window_start: r.n for r in batch.collect()}
    assert got == expected


def test_session_agg_merges_and_splits_on_gap(spark):
    from nba_data_pipeline_spark.streaming.windows import session_agg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 2.0),        # within 15m gap -> same session
        (3, t0 + dt.timedelta(minutes=50), 4.0),        # 40m gap -> new session
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sorted(
        session_agg(df, "ts", "15 minutes", aggs={"n": "count(*)", "s": "sum(v)"}).collect(),
        key=lambda r: r.session_start,
    )
    assert [(r.n, r.s) for r in out] == [(2, 3.0), (1, 4.0)]
    # session end = last event + gap
    assert out[0].session_end == t0 + dt.timedelta(minutes=25)
    assert out[1].session_end == t0 + dt.timedelta(minutes=65)


def test_session_agg_matches_relational_sessionize(spark):
    """F.session_window vs the gaps-and-islands batch analogue on the
    same frame: identical session membership and counts."""
    import random

    from nba_data_pipeline_spark.operators.windows import sessionize
    from nba_data_pipeline_spark.streaming.windows import session_agg

    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows, t = [], {u: t0 for u in range(3)}
    for i in range(120):
        u = rng.randrange(3)
        t[u] += dt.timedelta(seconds=rng.choice([30, 200, 4000]))
        rows.append((u, t[u]))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    # session_window uses gap strictly: new session when delta >= gap?
    # (semantics: event within [start, last+gap) extends) — sessionize
    # counts gap > threshold as a break; align by choosing gap between
    # the two deltas so semantics can't disagree at the boundary.
    a = session_agg(df, "ts", "1000 seconds", group_cols=["user_id"]).collect()
    b = (
        sessionize(df, ["user_id"], "ts", 1000)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("session_start"))
        .collect()
    )
    assert sorted((r.user_id, r.session_start, r.n) for r in a) == sorted(
        (r.user_id, r.session_start, r.n) for r in b
    )


def test_stream_session_counts_matches_batch(spark, tmp_path):
    import pytest

    from nba_data_pipeline_spark.streaming.windows import session_agg, stream_session_counts

    path = str(tmp_path / "sess_src")
    t0 = dt.datetime(2024, 1, 1)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=5)),
        (1, t0 + dt.timedelta(minutes=60)),
        (2, t0 + dt.timedelta(minutes=62)),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)
    got = {
        (r.user_id, r.session_start, r.session_end): r.n
        for r in stream_session_counts(
            spark, path, schema, "ts", "10 minutes", watermark="5 minutes",
            group_cols=["user_id"], query_name="t_sess_stream",
        ).collect()
    }
    expected = {
        (r.user_id, r.session_start, r.session_end): r.n
        for r in session_agg(
            spark.read.parquet(path), "ts", "10 minutes", group_cols=["user_id"]
        ).collect()
    }
    assert got == expected and len(got) == 3
    # global streaming session agg is rejected eagerly with a clear message
    with pytest.raises(ValueError, match="group column"):
        stream_session_counts(spark, path, schema, "ts", "10 minutes", watermark="5 minutes")
