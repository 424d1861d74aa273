import datetime as dt

from pyspark.sql import functions as F, types as T

from nba_data_pipeline_spark.streaming.stateful import stream_running_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.5),
        (1, t0 + dt.timedelta(minutes=1), 2.5),
        (2, t0, 10.0),
        (2, t0 + dt.timedelta(minutes=2), 0.5),
        (2, t0 + dt.timedelta(minutes=3), 0.5),
    ]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(src)

    out = stream_running_totals(
        spark, src, SCHEMA, "user_id", "value", query_name="rt_test"
    )
    # last update per key is the final running state
    final = {
        r.key: (r.total, r.n)
        for r in out.orderBy("n").collect()  # increasing n -> last wins per key
    }
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 6).alias("total"), F.count("*").alias("n"))
    )
    expected = {r.user_id: (r.total, r.n) for r in batch.collect()}
    assert final == expected
