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


# ---------------------------------------------------------------------------
# O2 box-seeded variant (reference get_starters_for_period,
# etl/players_on_court_at_start_of_period.py:73-88) + process_game fallback
# ---------------------------------------------------------------------------

def _box_df(spark, rows):
    return spark.createDataFrame(
        rows, "GAME_ID string, PERIOD long, PLAYER_ID long, TEAM_ID long, MIN string"
    )


def _full_box(spark):
    # Players with minutes per period, mirroring the fixture's stints:
    # P1: 101-106 (101 out at 300s, 106 in) / 201-206; P2: the five on
    # court all period per team. 107 listed with NULL MIN in P1 (DNP).
    rows = [("0022400001", 1, p, HOME, "5:00") for p in (101, 102, 103, 104, 105, 106)]
    rows += [("0022400001", 1, 107, HOME, None)]
    rows += [("0022400001", 1, p, AWAY, "5:00") for p in (201, 202, 203, 204, 205, 206)]
    rows += [("0022400001", 2, p, HOME, "12:00") for p in (103, 104, 105, 106, 107)]
    rows += [("0022400001", 2, p, AWAY, "12:00") for p in (201, 202, 203, 204, 205)]
    return _box_df(spark, rows)


def test_starters_box_seeded_ten_per_period(spark, pbp_df):
    from nba_data_pipeline_spark.operators.lineups import starters_per_period_box_seeded

    out = starters_per_period_box_seeded(pbp_df, _full_box(spark))
    by_period = {}
    for r in out.collect():
        by_period.setdefault((r.PERIOD, r.TEAM_ID), set()).add(r.PLAYER_ID)
    # the reference's 10-starters invariant (:135): exactly 5 per team
    assert by_period[(1, HOME)] == {101, 102, 103, 104, 105}  # 106 first-subbed IN
    assert by_period[(1, AWAY)] == {201, 202, 203, 204, 205}  # 206 first-subbed IN
    assert by_period[(2, HOME)] == {103, 104, 105, 106, 107}  # no P2 subs
    assert by_period[(2, AWAY)] == {201, 202, 203, 204, 205}
    counts = out.groupBy("GAME_ID", "PERIOD").count().collect()
    assert all(r["count"] == 10 for r in counts)


def test_starters_fallback_prefers_box_then_drops(spark, pbp_df):
    from nba_data_pipeline_spark.operators.lineups import starters_with_fallback

    # Healthy box: every period resolves via the box path.
    out = starters_with_fallback(pbp_df, _full_box(spark))
    assert set(r.SOURCE for r in out.collect()) == {"box"}
    assert out.count() == 20

    # Degrade P1 (drop player 105): box path finds 9 -> pbp fallback also
    # can't reach 10 on this sparse fixture -> P1 dropped, P2 intact (box).
    degraded = _full_box(spark).filter(
        ~((F.col("PERIOD") == 1) & (F.col("PLAYER_ID") == 105))
    )
    out2 = starters_with_fallback(pbp_df, degraded)
    rows = out2.collect()
    assert all(r.PERIOD == 2 for r in rows)
    assert len(rows) == 10 and set(r.SOURCE for r in rows) == {"box"}


def test_lineup_invariant_gate_trips_on_corrupt_stints(
    spark, pbp_df, rotations_df, team_game_log_df
):
    """VERDICT r2 #6: the reference's exactly-5-per-team invariant
    (etl/play_by_play_with_players.py:146-149) as a pipeline gate —
    healthy stints pass; a stint frame missing a starter leaves a null
    slot and must raise BEFORE null-filling can mask it."""
    import pytest

    from nba_data_pipeline_spark.plans.nba_pipelines import play_by_play_with_players

    healthy = play_by_play_with_players(
        pbp_df, rotations_df, team_game_log_df, validate_lineups=True
    )
    assert healthy.count() == 10  # gate passes silently

    corrupted = rotations_df.filter(F.col("PLAYER_ID") != 105)  # drop a starter
    with pytest.raises(ValueError, match="five_per_team"):
        play_by_play_with_players(
            pbp_df, corrupted, team_game_log_df, validate_lineups=True
        )


def test_overfull_floor_detected_by_count_expectation(
    spark, pbp_df, rotations_df, team_game_log_df
):
    """The five slot columns silently truncate a 6th on-court player,
    so only the pre-pivot counts can catch an over-full floor: a stint
    that never closes must trip exactly_five_on_court while the slot
    checks (five_per_team / ten_distinct_players) still pass."""
    from nba_data_pipeline_spark.operators.lineups import lineup_expectations
    from nba_data_pipeline_spark.operators.quality import validate

    extra = spark.createDataFrame(
        [("0022400001", 100, "Team", 999, "Extra", "Player",
          [{"IN_TIME_REAL": 0.0, "OUT_TIME_REAL": 14400.0}])],
        rotations_df.schema,
    )
    corrupted = rotations_df.unionByName(extra)  # 6 players on HOME floor
    out = lineups_via_range_join(pbp_df, corrupted, team_game_log_df)
    assert out.filter(F.col("TEAM1_ON_COURT") > 5).count() > 0
    checks = {r.check_name: r.passed for r in
              validate(out, lineup_expectations(counts=True)).collect()}
    assert checks["exactly_five_on_court"] is False   # the count sees it
    assert checks["five_per_team"] is True            # ...the slots do not
    # healthy frame passes all three
    healthy = lineups_via_range_join(pbp_df, rotations_df, team_game_log_df)
    ok = {r.check_name: r.passed for r in
          validate(healthy, lineup_expectations(counts=True)).collect()}
    assert all(ok.values())


def test_exact_scan_raises_on_overfull_floor(
    spark, pbp_df, rotations_df, team_game_log_df
):
    """The exact per-game scan must RAISE on a 6th on-court player
    (reference play_by_play_with_players.py:146-149) rather than let
    the 5-slot emission silently truncate it."""
    import pytest

    extra = spark.createDataFrame(
        [("0022400001", 100, "Team", 999, "Extra", "Player",
          [{"IN_TIME_REAL": 0.0, "OUT_TIME_REAL": 14400.0}])],
        rotations_df.schema,
    )
    corrupted = rotations_df.unionByName(extra)
    with pytest.raises(Exception, match="players on court"):
        track_lineups(pbp_df, corrupted, team_game_log_df).collect()


def test_declarative_underfull_floor_yields_nulls_not_crash(
    spark, pbp_df, rotations_df, team_game_log_df
):
    """ANSI-safety: a missing stint leaves trailing NULL slots (for the
    five_per_team gate) instead of an array-index crash (F.get)."""
    degraded = rotations_df.filter(F.col("PLAYER_ID") != 105)  # drop a starter
    out = lineups_via_range_join(pbp_df, degraded, team_game_log_df)
    rows = out.collect()
    assert len(rows) > 0
    assert any(r.TEAM1_PLAYER5 is None for r in rows)
    assert all(r.TEAM1_ON_COURT <= 5 for r in rows)
