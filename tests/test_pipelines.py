import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.incremental import assert_unique_key
from nba_data_pipeline_spark.plans import nba_pipelines as P
from tests.conftest import AWAY, GAME_ID, HOME


def test_team_game_log_pipeline(spark, team_game_log_df):
    out = P.team_game_log(team_game_log_df, "2024-25", "Regular Season")
    rows = {r.id: r for r in out.collect()}
    assert f"{GAME_ID}-{HOME}" in rows
    assert rows[f"{GAME_ID}-{HOME}"].SEASON == "2024-25"
    assert_unique_key(out, "id")


def test_play_by_play_pipeline_decodes_season(spark, pbp_df):
    out = P.play_by_play(pbp_df.drop("SEASON", "SEASON_TYPE"))
    r = out.filter(F.col("EVENTNUM") == 1).collect()[0]
    assert r.SEASON == "2024-25" and r.SEASON_TYPE == "Regular Season"
    assert r.id == f"{GAME_ID}-1"
    assert_unique_key(out, "id")


def test_rotations_pipeline(spark, rotation_raw_df):
    out = P.rotations(rotation_raw_df, "2024-25", "Regular Season")
    assert out.count() == 13  # one row per (game, player) with stints
    assert_unique_key(out, "id")


def test_players_on_court_pipeline(spark, pbp_df):
    out = P.players_on_court_at_start_of_period(pbp_df)
    assert_unique_key(out, "id")
    r = out.collect()[0]
    assert r.SEASON == "2024-25" and r.SEASON_TYPE == "Regular Season"


def test_play_by_play_with_players_pipeline(spark, pbp_df, rotations_df, team_game_log_df):
    out = P.play_by_play_with_players(pbp_df, rotations_df, team_game_log_df)
    assert out.count() == 10
    assert_unique_key(out, "id")
    row = out.filter(F.col("EVENTNUM") == 100).collect()[0]
    assert [row[f"TEAM1_PLAYER{i}"] for i in range(1, 6)] == [103, 104, 105, 106, 107]


def test_play_by_play_with_players_impls_identical(
    spark, pbp_df, rotations_df, team_game_log_df
):
    """Both lineup engines must produce byte-identical pipeline output
    (VERDICT r6 task #2): the declarative range-join default and the
    reference-exact applyInPandas scan, run through the full composed
    pipeline (stamp + id + fill)."""
    decl = P.play_by_play_with_players(
        pbp_df, rotations_df, team_game_log_df, impl="declarative"
    )
    exact = P.play_by_play_with_players(
        pbp_df, rotations_df, team_game_log_df, impl="exact"
    )
    assert sorted(decl.columns) == sorted(exact.columns)
    cols = sorted(decl.columns)
    d = sorted(tuple(r) for r in decl.select(*cols).collect())
    e = sorted(tuple(r) for r in exact.select(*cols).collect())
    assert d == e
    with pytest.raises(ValueError, match="impl"):
        P.play_by_play_with_players(pbp_df, rotations_df, impl="bogus")


def test_incremental_game_ids(spark, team_game_log_df):
    tgl = P.team_game_log(team_game_log_df, "2024-25", "Regular Season")
    work = P.incremental_game_ids(tgl, None, "2024-25", "Regular Season")
    assert work.count() == 1
    existing = spark.createDataFrame([(GAME_ID,)], "GAME_ID string")
    pruned = P.incremental_game_ids(tgl, existing, "2024-25", "Regular Season")
    assert pruned.count() == 0
