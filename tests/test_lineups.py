from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.lineups import (
    LINEUP_COLS,
    derive_seconds_from_start,
    lineups_via_range_join,
    resolve_game_teams,
    starters_from_rotations,
    starters_per_period,
    track_lineups,
)
from tests.conftest import AWAY, HOME


def test_resolve_game_teams_jump_ball(spark, pbp_df):
    pbp = derive_seconds_from_start(pbp_df)
    row = resolve_game_teams(pbp).collect()[0]
    assert (row.TEAM1_ID, row.TEAM2_ID) == (HOME, AWAY)


def test_resolve_game_teams_matchup_fallback(spark, pbp_df, team_game_log_df):
    pbp = derive_seconds_from_start(pbp_df.filter(F.col("EVENTMSGTYPE") != 10))
    row = resolve_game_teams(pbp, team_game_log_df).collect()[0]
    assert (row.TEAM1_ID, row.TEAM2_ID) == (HOME, AWAY)


def test_starters_per_period_pbp_variant(spark, pbp_df):
    out = starters_per_period(pbp_df)
    got = {
        (r.PERIOD, r.PLAYER_ID): r.TEAM_ID for r in out.collect()
    }
    # P1: 101 subbed OUT first -> starter; 106 subbed IN -> not; 202 OUT -> starter
    assert (1, 101) in got and (1, 202) in got
    assert (1, 106) not in got and (1, 206) not in got
    # P2: no subs; everyone seen in P2 events counts (103/203 jump only in P1)
    assert (2, 202) in got and (2, 107) in got


def test_starters_from_rotations_full_lineups(spark, rotations_df):
    out = starters_from_rotations(rotations_df)
    by_period = {}
    for r in out.collect():
        by_period.setdefault((r.PERIOD, r.TEAM_ID), set()).add(r.PLAYER_ID)
    assert by_period[(1, HOME)] == {101, 102, 103, 104, 105}
    assert by_period[(1, AWAY)] == {201, 202, 203, 204, 205}
    assert by_period[(2, HOME)] == {103, 104, 105, 106, 107}
    assert by_period[(2, AWAY)] == {201, 202, 203, 204, 205}


EXPECTED = {
    # eventnum -> (team1 lineup, team2 lineup) AFTER the event applies
    1: ([101, 102, 103, 104, 105], [201, 202, 203, 204, 205]),
    2: ([101, 102, 103, 104, 105], [201, 202, 203, 204, 205]),
    5: ([101, 102, 103, 104, 105], [201, 202, 203, 204, 205]),
    10: ([102, 103, 104, 105, 106], [201, 202, 203, 204, 205]),
    15: ([102, 103, 104, 105, 106], [201, 202, 203, 204, 205]),
    20: ([102, 103, 104, 105, 106], [201, 203, 204, 205, 206]),
    25: ([102, 103, 104, 105, 106], [201, 203, 204, 205, 206]),
    100: ([103, 104, 105, 106, 107], [201, 202, 203, 204, 205]),
    105: ([103, 104, 105, 106, 107], [201, 202, 203, 204, 205]),
    110: ([103, 104, 105, 106, 107], [201, 202, 203, 204, 205]),
}


def _lineups(rows):
    return {
        r["EVENTNUM"]: (
            [r[f"TEAM1_PLAYER{i}"] for i in range(1, 6)],
            [r[f"TEAM2_PLAYER{i}"] for i in range(1, 6)],
        )
        for r in rows
    }


def test_track_lineups_exact_semantics(spark, pbp_df, rotations_df, team_game_log_df):
    out = track_lineups(pbp_df, rotations_df, team_game_log_df)
    assert set(out.columns) >= set(LINEUP_COLS) | {"SECONDS_FROM_START"}
    got = _lineups([r.asDict() for r in out.collect()])
    assert got == EXPECTED


def test_range_join_variant_matches_stateful_scan(
    spark, pbp_df, rotations_df, team_game_log_df
):
    declarative = lineups_via_range_join(pbp_df, rotations_df, team_game_log_df)
    got = _lineups([r.asDict() for r in declarative.collect()])
    assert got == EXPECTED
