from pyspark.sql import functions as F

from nba_data_pipeline_spark.functions.ids import add_id, fill_nulls, stamp
from nba_data_pipeline_spark.functions.timeops import clock_to_seconds, period_time_bounds
from nba_data_pipeline_spark.functions.gameid import (
    season_from_game_id,
    season_type_from_game_id,
)


def test_clock_to_seconds_regulation_and_ot(spark):
    df = spark.createDataFrame(
        [(1, "12:00"), (1, "11:23"), (4, "0:01"), (5, "5:00"), (6, "2:30")],
        "PERIOD long, PCTIMESTRING string",
    )
    out = [r[0] for r in df.select(clock_to_seconds("PERIOD", "PCTIMESTRING")).collect()]
    # p1 12:00 -> 0; p1 11:23 -> 37; p4 0:01 -> 2879; p5 5:00 -> 2880; p6 2:30 -> 3330
    assert out == [0, 37, 2879, 2880, 3330]


def test_period_time_bounds(spark):
    df = spark.createDataFrame([(1,), (4,), (5,)], "PERIOD long")
    lo, hi = period_time_bounds("PERIOD")
    rows = df.select(lo.alias("lo"), hi.alias("hi")).collect()
    assert [(r.lo, r.hi) for r in rows] == [(0, 7200), (21600, 28800), (28800, 31800)]


def test_season_decode(spark):
    df = spark.createDataFrame(
        [("0022400061",), ("0012300001",), ("0049900001",), ("0092400001",)], "GAME_ID string"
    )
    rows = df.select(
        season_from_game_id("GAME_ID").alias("s"),
        season_type_from_game_id("GAME_ID").alias("t"),
    ).collect()
    assert rows[0].s == "2024-25" and rows[0].t == "Regular Season"
    assert rows[1].s == "2023-24" and rows[1].t == "Pre Season"
    assert rows[2].s == "2099-00" and rows[2].t == "Playoffs"
    assert rows[3].t is None


def test_add_id_and_fill_nulls_and_stamp(spark):
    df = spark.createDataFrame(
        [("0022400061", 7, None, "x"), ("0022400061", 8, 1.5, None)],
        "GAME_ID string, EVENTNUM long, v double, s string",
    )
    out = stamp(fill_nulls(add_id(df, ["GAME_ID", "EVENTNUM"])), {"SEASON": "2024-25"})
    rows = {r.id: r for r in out.collect()}
    assert rows["0022400061-7"].v == 0.0  # numeric null -> 0.0
    assert rows["0022400061-8"].s is None  # string null stays null
    assert rows["0022400061-7"].SEASON == "2024-25"


def test_clock_to_seconds_malformed_clock_yields_null(spark):
    """ANSI-safety: a colon-less PCTIMESTRING must yield NULL seconds,
    not crash the job (F.get, not getItem)."""
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.functions.timeops import clock_to_seconds

    df = spark.createDataFrame(
        [(1, "7:30"), (1, "12"), (1, "")], "period long, clock string"
    )
    rows = df.select(clock_to_seconds("period", "clock").alias("s")).collect()
    assert rows[0].s == 720 - 450
    assert rows[1].s is None and rows[2].s is None


def test_season_decode_malformed_game_id_yields_null(spark):
    """ANSI-safety: non-numeric GAME_IDs decode to NULL season instead
    of raising CAST_INVALID_INPUT (try_cast)."""
    from nba_data_pipeline_spark.functions.gameid import season_from_game_id

    df = spark.createDataFrame(
        [("0022400061",), ("00xyz00001",), ("",)], "GAME_ID string"
    )
    rows = df.select(season_from_game_id("GAME_ID").alias("s")).collect()
    assert rows[0].s == "2024-25"
    assert rows[1].s is None and rows[2].s is None
