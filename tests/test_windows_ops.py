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


def test_funnel_steps_ordering_semantics(spark):
    import datetime as dt

    from nba_data_pipeline_spark.operators.windows import funnel_counts, funnel_steps

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # u1 completes all three in order
        (1, "view", t(0)), (1, "click", t(5)), (1, "purchase", t(10)),
        # u2: click BEFORE view only -> stops at step 1 (stays in frame!)
        (2, "click", t(0)), (2, "view", t(5)),
        # u3: view then purchase but never click -> stops at step 1
        (3, "view", t(0)), (3, "purchase", t(5)),
        # u4: never views -> absent entirely
        (4, "click", t(0)), (4, "purchase", t(1)),
        # u5: view, click, but purchase precedes click -> stops at step 2
        (5, "purchase", t(0)), (5, "view", t(1)), (5, "click", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    per_user = {r.user: r for r in funnel_steps(df, "user_id", "event_type", "ts",
                                                ["view", "click", "purchase"]).collect()}
    assert set(per_user) == {1, 2, 3, 5}
    assert per_user[1].step_3_ts == t(10)
    assert per_user[2].step_2_ts is None and per_user[2].step_3_ts is None
    assert per_user[3].step_2_ts is None
    assert per_user[5].step_2_ts == t(2) and per_user[5].step_3_ts is None
    counts = {r.step: r.n_users for r in funnel_counts(
        df, "user_id", "event_type", "ts", ["view", "click", "purchase"]).collect()}
    assert counts == {1: 4, 2: 2, 3: 1}


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from nba_data_pipeline_spark.operators.windows import cohort_retention

    d = lambda days: dt.datetime(2024, 1, 4) + dt.timedelta(days=days)  # noqa: E731
    rows = [
        (1, d(0)), (1, d(7)), (1, d(21)),   # cohort w0, back at +1, +3
        (2, d(0)), (2, d(1)),               # cohort w0, two events same period
        (3, d(7)),                          # cohort w1 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    rows_out = cohort_retention(df, "user_id", "ts", period_days=7).collect()
    base = min(r.cohort_period for r in rows_out)
    m = {(r.cohort_period - base, r.period_offset): r.n_users for r in rows_out}
    assert m == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def test_event_transitions_counts_within_session_only(spark):
    import datetime as dt

    from nba_data_pipeline_spark.operators.windows import event_transitions

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        (1, 1, "a", t(0)), (1, 2, "b", t(1)), (1, 3, "a", t(2)),
        # 2h gap -> new session; a->b NOT counted across the break
        (1, 4, "b", t(130)), (1, 5, "c", t(131)),
        (2, 6, "a", t(0)), (2, 7, "b", t(3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts timestamp")
    out = {(r.from_type, r.to_type): r.n for r in event_transitions(
        df, ["user_id"], "ts", "event_type", 3600, order_by=["ts", "event_id"]).collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}


def test_rolling_agg_trailing_range_frame(spark):
    import datetime as dt

    from nba_data_pipeline_spark.operators.windows import rolling_agg

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        (1, t(0), 1.0), (1, t(50), 2.0), (1, t(100), 4.0),  # 60s window
        (1, t(300), 8.0),                                   # far from the rest
        (2, t(0), 100.0),                                   # other key isolated
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {(r.user_id, r.ts): (r.rolling_count, r.rolling_sum, r.rolling_avg)
           for r in rolling_agg(df, ["user_id"], "ts", "value", 60).collect()}
    assert out[(1, t(0))] == (1, 1.0, 1.0)
    assert out[(1, t(50))] == (2, 3.0, 1.5)
    assert out[(1, t(100))] == (2, 6.0, 3.0)   # t(0) fell out of the 60s range
    assert out[(1, t(300))] == (1, 8.0, 8.0)
    assert out[(2, t(0))] == (1, 100.0, 100.0)

    import pytest as _p
    with _p.raises(ValueError, match="unknown rolling aggs"):
        rolling_agg(df, ["user_id"], "ts", "value", 60, aggs=("median",))


def test_top_paths_and_activity_profile(spark):
    import datetime as dt

    from nba_data_pipeline_spark.operators.windows import activity_profile, top_paths

    t = lambda m: dt.datetime(2024, 1, 7, 10, 0) + dt.timedelta(minutes=m)  # a Sunday
    rows = [
        (1, 1, "a", t(0)), (1, 2, "b", t(1)), (1, 3, "c", t(2)), (1, 4, "b", t(3)),
        (2, 5, "a", t(0)), (2, 6, "b", t(1)), (2, 7, "c", t(2)),
        # session break: the a>b>c run must NOT bridge it
        (3, 8, "a", t(0)), (3, 9, "b", t(1)), (3, 10, "c", t(200)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts timestamp")
    paths = {r.path: r.n for r in top_paths(
        df, ["user_id"], "ts", "event_type", 3600, path_len=3, k=10,
        order_by=["ts", "event_id"]).collect()}
    assert paths["a>b>c"] == 2          # users 1 and 2; user 3's run is split
    assert paths.get("b>c>b") == 1      # user 1's overlapping path
    assert "a>b" not in paths           # only full-length paths

    prof = {(r.user_id, r.dow, r.hour): r.n for r in activity_profile(df, "user_id", "ts").collect()}
    # 2024-01-07 is a Sunday (dow 0), events at 10:00-10:03 UTC
    assert prof[(1, 0, 10)] == 4 and prof[(2, 0, 10)] == 3
    # user 3's late event lands ~3h20m later -> hour 13
    assert prof[(3, 0, 13)] == 1

    import pytest as _p
    with _p.raises(ValueError, match="path_len"):
        top_paths(df, ["user_id"], "ts", "event_type", 3600, path_len=1)


def test_profile_entropy_separates_bot_from_organic(spark):
    import datetime as dt
    import math

    from nba_data_pipeline_spark.operators.windows import profile_entropy

    rows = []
    # bot: 48 events all at the exact same (dow, hour) cell
    for i in range(48):
        rows.append((1, dt.datetime(2024, 1, 1, 3, 0) + dt.timedelta(seconds=i)))
    # organic: 48 events spread over 48 distinct hours
    for i in range(48):
        rows.append((2, dt.datetime(2024, 1, 1, 0, 30) + dt.timedelta(hours=i)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.user_id: r for r in profile_entropy(df, "user_id", "ts").collect()}
    assert out[1].n_cells == 1 and out[1].entropy_e6 == 0
    assert out[2].n_cells == 48
    expect = round(math.log(48) * 1e6)  # uniform over 48 cells
    assert abs(out[2].entropy_e6 - expect) <= 48  # per-term rounding slack
    assert out[1].n_events == out[2].n_events == 48


def test_touch_attribution_first_last_and_lookback(spark):
    from pyspark.sql import functions as F
    from nba_data_pipeline_spark.operators.windows import touch_attribution

    rows = [
        # user 1: view@100, click@200, purchase@300 -> first=view, last=click
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # user 1: second purchase@5000 with lookback 1000 -> no touch in window
        (1, "purchase", 5000),
        # user 2: touch exactly at the conversion timestamp counts (<=)
        (2, "click", 700), (2, "purchase", 700),
        # user 3: only an old touch outside the lookback
        (3, "view", 10), (3, "purchase", 2000),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, s long").withColumn(
        "ts", F.timestamp_seconds("s")
    )
    out = {
        (r.user, r.conv_ts_us): r
        for r in touch_attribution(
            df, "user_id", "event_type", "ts",
            conversion_type="purchase", touch_types=["view", "click"],
            lookback_seconds=1000,
        ).collect()
    }
    a = out[(1, 300_000_000)]
    assert (a.first_touch_type, a.first_touch_ts_us) == ("view", 100_000_000)
    assert (a.last_touch_type, a.last_touch_ts_us) == ("click", 200_000_000)
    b = out[(1, 5_000_000_000)]
    assert b.first_touch_type is None and b.last_touch_ts_us is None
    c = out[(2, 700_000_000)]
    assert c.first_touch_type == "click" and c.first_touch_ts_us == 700_000_000
    d = out[(3, 2_000_000_000)]
    assert d.first_touch_type is None

    # simultaneous view+click resolve deterministically by code (view=1 < click=2)
    tie = spark.createDataFrame(
        [(9, "view", 50), (9, "click", 50), (9, "purchase", 60)],
        "user_id long, event_type string, s long",
    ).withColumn("ts", F.timestamp_seconds("s"))
    t = touch_attribution(
        tie, "user_id", "event_type", "ts",
        conversion_type="purchase", touch_types=["view", "click"],
        lookback_seconds=100,
    ).collect()[0]
    assert t.first_touch_type == "view" and t.last_touch_type == "click"

    # type codes outside [1, 7] rejected
    import pytest
    with pytest.raises(ValueError, match="type codes"):
        touch_attribution(
            df, "user_id", "event_type", "ts", "purchase", ["view"],
            1000, type_codes={"view": 8},
        )
