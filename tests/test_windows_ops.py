import datetime as dt

from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.windows import (
    first_row_per_group,
    running_distinct_count,
    running_sum,
    sessionize,
    top_k_per_group,
)


def _events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "a", 1.0),
        (2, t0 + dt.timedelta(seconds=30), "b", 2.0),
        (3, t0 + dt.timedelta(seconds=7200), "a", 3.0),  # gap > 1h -> new session
        (4, t0 + dt.timedelta(seconds=7230), "a", 4.0),
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, k string, v double")


def test_first_and_topk(spark):
    df = _events(spark).withColumn("user_id", F.lit(1))
    first = first_row_per_group(df, ["user_id"], ["ts", "event_id"]).collect()
    assert len(first) == 1 and first[0].event_id == 1
    top = top_k_per_group(df, ["user_id"], [F.col("v").desc(), "event_id"], 2).collect()
    assert [r.event_id for r in top] == [4, 3]


def test_running_sum_and_sessionize(spark):
    df = _events(spark).withColumn("user_id", F.lit(1))
    rs = running_sum(df, ["user_id"], ["ts", "event_id"], "v").collect()
    assert [r.running for r in sorted(rs, key=lambda r: r.event_id)] == [1.0, 3.0, 6.0, 10.0]
    sess = sessionize(df, ["user_id"], "ts", gap_seconds=3600, order_by=["ts", "event_id"])
    got = {r.event_id: r.session_id for r in sess.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}


def test_running_distinct_count(spark):
    df = _events(spark).withColumn("user_id", F.lit(1))
    out = running_distinct_count(df, ["user_id"], ["ts", "event_id"], "k")
    got = {r.event_id: r.n_distinct_so_far for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 2}


def test_sessionize_rejects_integer_ts(spark):
    """A raw epoch-long ts column must raise, not silently saturate
    through a seconds-cast (an int cast to timestamp is read as epoch
    SECONDS — epoch-nanos values would collapse every gap to zero)."""
    import pytest as _pytest

    from nba_data_pipeline_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        [(1, 1_700_000_000_000_000_000), (1, 1_700_000_100_000_000_000)],
        "user_id long, ts long",
    )
    with _pytest.raises(ValueError, match="temporal"):
        sessionize(df, ["user_id"], "ts", gap_seconds=30)
