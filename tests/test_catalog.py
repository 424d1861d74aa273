import datetime

from pyspark.sql import functions as F

from nba_data_pipeline_spark.functions.gameid import current_season
from nba_data_pipeline_spark.sinks.catalog import (
    ensure_database,
    register_temp_views,
    save_table,
    table,
)


def test_current_season_rolls_in_september():
    assert current_season(datetime.date(2026, 8, 13)) == "2025-26"
    assert current_season(datetime.date(2026, 9, 1)) == "2026-27"
    assert current_season(datetime.date(2024, 12, 25)) == "2024-25"


def test_database_and_bucketed_table_join_without_shuffle(spark, tmp_path):
    ensure_database(spark, "nba_test", location=str(tmp_path / "wh"))
    a = spark.createDataFrame(
        [(f"g{i}", i, float(i)) for i in range(100)], "GAME_ID string, EVENTNUM long, v double"
    )
    b = spark.createDataFrame(
        [(f"g{i}", i % 3) for i in range(100)], "GAME_ID string, TEAM long"
    )
    save_table(a, "nba_test.pbp_b", bucket_by=(4, ["GAME_ID"]), sort_by=["GAME_ID"])
    save_table(b, "nba_test.rot_b", bucket_by=(4, ["GAME_ID"]), sort_by=["GAME_ID"])
    ta, tb = table(spark, "nba_test.pbp_b"), table(spark, "nba_test.rot_b")
    joined = ta.join(tb.hint("merge"), "GAME_ID")
    assert joined.count() == 100
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # bucketed-by-join-key tables: sort-merge join with NO shuffle on the key
    assert "Exchange hashpartitioning(GAME_ID" not in plan
    assert "SortMergeJoin" in plan
    spark.sql("DROP DATABASE nba_test CASCADE")


def test_register_temp_views_sql_surface(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    register_temp_views(spark, {"tv_demo": df})
    assert spark.sql("SELECT count(*) AS n FROM tv_demo").collect()[0].n == 1
