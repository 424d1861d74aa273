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
