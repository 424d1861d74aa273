from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.timeseries import (
    bucket_start,
    forward_fill,
    resample_ffill,
    time_spine,
)

DAY = 86400


def _events(spark, rows):
    df = spark.createDataFrame(rows, "k string, ts string, v double")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_bucket_start_day_floor(spark):
    df = _events(spark, [("a", "2024-01-02 23:59:59", 1.0)])
    got = df.select(bucket_start("ts", DAY).alias("b")).collect()[0]["b"]
    # 2024-01-02 00:00:00 UTC
    assert got == 1704153600


def test_time_spine_dense_between_first_and_last(spark):
    df = _events(
        spark,
        [("a", "2024-01-01 05:00:00", 1.0), ("a", "2024-01-04 01:00:00", 2.0),
         ("b", "2024-01-02 00:00:00", 3.0)],
    )
    spine = time_spine(df, ["k"], "ts", DAY)
    got = sorted((r["k"], r["bucket_ts"]) for r in spine.collect())
    base = 1704067200  # 2024-01-01
    assert got == [
        ("a", base), ("a", base + DAY), ("a", base + 2 * DAY), ("a", base + 3 * DAY),
        ("b", base + DAY),
    ]


def test_forward_fill_gaps_and_leading_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, None),
         ("a", 5, 7.0), ("b", 1, None)],
        "k string, t int, v double",
    )
    got = {
        (r["k"], r["t"]): r["v"]
        for r in forward_fill(df, ["k"], "t", ["v"]).collect()
    }
    assert got == {
        ("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0, ("a", 4): 5.0,
        ("a", 5): 7.0, ("b", 1): None,
    }


def test_resample_ffill_end_to_end(spark):
    df = _events(
        spark,
        [
            ("a", "2024-01-01 01:00:00", 2.0),
            ("a", "2024-01-01 13:00:00", 4.0),
            # gap on Jan 2 and 3
            ("a", "2024-01-04 09:00:00", 10.0),
        ],
    )
    out = resample_ffill(
        df, ["k"], "ts", DAY, {"avg_v": F.avg("v"), "max_v": F.max("v")}
    )
    base = 1704067200
    rows = {r["bucket_ts"]: r for r in out.collect()}
    assert sorted(rows) == [base, base + DAY, base + 2 * DAY, base + 3 * DAY]
    assert rows[base]["n_obs"] == 2 and rows[base]["avg_v"] == 3.0
    # gap rows: zero observations, value carried forward
    for b in (base + DAY, base + 2 * DAY):
        assert rows[b]["n_obs"] == 0
        assert rows[b]["avg_v"] == 3.0 and rows[b]["max_v"] == 4.0
    assert rows[base + 3 * DAY]["avg_v"] == 10.0


def test_resample_conserves_row_count(spark):
    df = _events(
        spark,
        [("a", "2024-01-01 01:00:00", 1.0), ("a", "2024-01-03 01:00:00", 2.0),
         ("b", "2024-01-05 01:00:00", 3.0), ("b", "2024-01-05 02:00:00", 4.0)],
    )
    out = resample_ffill(df, ["k"], "ts", DAY, {"avg_v": F.avg("v")})
    assert out.agg(F.sum("n_obs")).collect()[0][0] == df.count()


def test_resample_rejects_non_temporal_order_column(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts int, v double")
    with pytest.raises(Exception):
        resample_ffill(df, ["k"], "ts", DAY, {"avg_v": F.avg("v")})


def test_activity_bursts_flags_spike_with_full_history_gate(spark):
    from nba_data_pipeline_spark.operators.timeseries import activity_bursts

    # user a: 1 event/day for 7 days, then a 10-event day 8 (burst),
    # then 1 event on day 9 (not a burst). Early days lack full history.
    rows = []
    for d in range(7):
        rows.append(("a", f"2024-01-{d+1:02d} 10:00:00", 1.0))
    rows += [("a", "2024-01-08 10:00:00", 1.0)] * 10
    rows.append(("a", "2024-01-09 10:00:00", 1.0))
    df = _events(spark, rows)
    out = {
        r.bucket_ts: r
        for r in activity_bursts(df, ["k"], "ts", DAY, factor=3, trailing=7).collect()
    }
    base = 1704067200
    burst_day, after = base + 7 * DAY, base + 8 * DAY
    assert out[burst_day].is_burst  # 10 * 7 > 3 * 7
    assert out[burst_day].trailing_sum == 7
    assert not out[after].is_burst  # 1 * 7 < 3 * (6 + 10)
    # no early bucket flags without 7 full trailing buckets
    for d in range(7):
        assert not out[base + d * DAY].is_burst


def test_interpolate_linear_semantics(spark):
    from nba_data_pipeline_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [("a", 0, None), ("a", 10, 1.0), ("a", 20, None), ("a", 30, None),
         ("a", 40, 7.0), ("a", 50, None), ("b", 1, None)],
        "k string, t int, v double",
    )
    got = {
        (r["k"], r["t"]): r["v"]
        for r in interpolate_linear(df, ["k"], "t", ["v"]).collect()
    }
    assert got[("a", 0)] is None          # leading gap stays NULL
    assert got[("a", 10)] == 1.0          # observed rows untouched
    assert got[("a", 20)] == pytest.approx(3.0)   # 1 + (7-1)*(20-10)/(40-10)
    assert got[("a", 30)] == pytest.approx(5.0)
    assert got[("a", 40)] == 7.0
    assert got[("a", 50)] == 7.0          # trailing gap carries flat
    assert got[("b", 1)] is None          # all-NULL key stays NULL


def test_interpolate_linear_uneven_spacing_and_partitioning(spark):
    from nba_data_pipeline_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 1, None), ("a", 100, 100.0)],
        "k string, t int, v double",
    )
    outs = []
    for k in (1, 5):
        got = {
            r["t"]: r["v"]
            for r in interpolate_linear(
                df.repartition(k), ["k"], "t", ["v"]
            ).collect()
        }
        outs.append(got)
    # position-proportional, not row-proportional
    assert outs[0][1] == pytest.approx(1.0)
    assert outs[0] == outs[1]


def test_resample_interpolate_end_to_end(spark):
    from nba_data_pipeline_spark.operators.timeseries import resample_interpolate

    base = 1704067200  # 2024-01-01
    df = _events(
        spark,
        [("a", "2024-01-01 05:00:00", 2.0), ("a", "2024-01-04 01:00:00", 8.0)],
    )
    out = resample_interpolate(df, ["k"], "ts", DAY, {"v": F.min("v")})
    got = {r["bucket_ts"]: (r["n_obs"], r["v"]) for r in out.collect()}
    assert got[base] == (1, 2.0)
    assert got[base + DAY] == (0, pytest.approx(4.0))
    assert got[base + 2 * DAY] == (0, pytest.approx(6.0))
    assert got[base + 3 * DAY] == (1, 8.0)
