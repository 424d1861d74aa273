"""The six reference pipelines as pure DataFrame transforms.

Each reference CLI (``python -m etl.<name>``) becomes a function
``DataFrame(s) -> DataFrame``: no loops over games, no write batching,
no thread pools — one lazy plan per pipeline (SURVEY.md §3 "Spark
shape"). Ingest inputs arrive as DataFrames (from sources/ or test
fixtures); persistence is the caller's choice via sinks/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.gameid import season_from_game_id, season_type_from_game_id
from ..functions.ids import add_id, fill_nulls, stamp
from ..operators.incremental import delta_filter
from ..operators.lineups import starters_per_period, track_lineups
from ..operators.rollup import rollup_stints


def team_game_log(raw_log: DataFrame, season: str, season_type: str) -> DataFrame:
    """Reference etl/team_game_log.py:17-33: stamp season/type, add
    GAME_ID-TEAM_ID id, fill numeric nulls."""
    df = stamp(raw_log, {"SEASON": season, "SEASON_TYPE": season_type})
    df = add_id(df, ["GAME_ID", "TEAM_ID"])
    return fill_nulls(df)


def play_by_play(raw_pbp: DataFrame) -> DataFrame:
    """Reference etl/play_by_play.py:21-36: decode SEASON/SEASON_TYPE
    from the GAME_ID string, add GAME_ID-EVENTNUM id, fill nulls,
    drop duplicate rows."""
    df = raw_pbp.withColumn("SEASON", season_from_game_id("GAME_ID")).withColumn(
        "SEASON_TYPE", season_type_from_game_id("GAME_ID")
    )
    df = add_id(df, ["GAME_ID", "EVENTNUM"])
    return fill_nulls(df).dropDuplicates()


def rotations(rotation_raw: DataFrame, season: str, season_type: str) -> DataFrame:
    """Reference etl/rotations.py:22-65: project, rename, roll stints
    up into the native array<struct> STINTS column, stamp, id."""
    rolled = rollup_stints(rotation_raw)
    rolled = stamp(rolled, {"SEASON": season, "SEASON_TYPE": season_type})
    rolled = add_id(rolled, ["GAME_ID", "PLAYER_ID"])
    return rolled


def shot_details(raw_shots: DataFrame, player_id: int, team_id: int,
                 season: str, season_type: str) -> DataFrame:
    """Reference etl/shot_details.py:12-25: stamp the query context,
    add PLAYER_ID-GAME_ID-GAME_EVENT_ID id, fill nulls, dedup."""
    df = stamp(raw_shots, {
        "PLAYER_ID": player_id, "TEAM_ID": team_id,
        "SEASON": season, "SEASON_TYPE": season_type,
    })
    df = add_id(df, ["PLAYER_ID", "GAME_ID", "GAME_EVENT_ID"])
    return fill_nulls(df).dropDuplicates()


def players_on_court_at_start_of_period(pbp: DataFrame) -> DataFrame:
    """Reference etl/players_on_court_at_start_of_period.py (pbp
    variant, :90-122) — relational starters; exactly 10 rows per
    (game, period) on clean data. Stamps season/type decoded from
    GAME_ID and the 3-part id."""
    starters = starters_per_period(pbp)
    df = starters.withColumn("SEASON", season_from_game_id("GAME_ID")).withColumn(
        "SEASON_TYPE", season_type_from_game_id("GAME_ID")
    )
    return add_id(df, ["GAME_ID", "PERIOD", "PLAYER_ID"])


def play_by_play_with_players(
    pbp: DataFrame,
    rotations_df: DataFrame,
    team_game_log_df: DataFrame | None = None,
    fallback_lineups: DataFrame | None = None,
    validate_lineups: bool = False,
    impl: str = "declarative",
) -> DataFrame:
    """Reference etl/play_by_play_with_players.py:113-165 as one lazy
    plan (SURVEY.md §3.3): lineup derivation, then null-fill + id +
    (caller-side) duplicate assertion.

    ``impl`` selects the lineup engine — both are event-by-event equal
    on consistent data (cross-checked in tests/test_lineup_property.py
    and tests/test_pipelines.py):

    - ``"declarative"`` (default): explode + anchored range-join +
      pivot (``lineups_via_range_join``) — pure DataFrame ops, no
      Python in the hot path. The bench crossover (COVERAGE.md) shows
      it ~3-4x faster than the pandas scan at sf0.1; it is the 100-TB
      path and therefore the default. ``fallback_lineups`` flows into
      its declarative per-period repair (broken team-periods re-seeded
      from the period-lineup table and toggled by that period's subs —
      reference etl/play_by_play_with_players.py:142-152), so the
      scale path keeps reference repair semantics.
    - ``"exact"``: the cogrouped applyInPandas stateful scan
      (``track_lineups``) — the reference-faithful imperative form
      with the same repair (cross-checked on inconsistent-stint
      fixtures in tests/test_lineup_property.py).

    ``validate_lineups`` enforces the reference's hard invariant
    (:146-149 — exactly five players per team on every event) via the
    one-scan ``quality.assert_valid`` gate, BEFORE null-filling can
    mask missing slots. It is an eager action (one extra pass over the
    tracked frame), so it is opt-in — the reference equivalent raises
    per game inside its loop."""
    if impl not in ("declarative", "exact"):
        raise ValueError(f"impl must be 'declarative' or 'exact', got {impl!r}")
    if impl == "declarative":
        from ..operators.lineups import lineups_via_range_join

        tracked = lineups_via_range_join(
            pbp, rotations_df, team_game_log_df, fallback_lineups
        ).drop("TEAM1_ON_COURT", "TEAM2_ON_COURT")
    else:
        tracked = track_lineups(pbp, rotations_df, team_game_log_df, fallback_lineups)
    if validate_lineups:
        from ..operators.lineups import lineup_expectations
        from ..operators.quality import assert_valid

        assert_valid(tracked, lineup_expectations())
    tracked = add_id(tracked, ["GAME_ID", "EVENTNUM"])
    return fill_nulls(tracked)


def incremental_game_ids(
    team_game_log_df: DataFrame,
    existing: DataFrame | None,
    season: str,
    season_type: str,
) -> DataFrame:
    """Driving-dimension scan + delta prune (reference J1/J2 pattern,
    e.g. etl/play_by_play.py:98-115): distinct GAME_IDs for the season
    minus those already in the target table. Both sides are key-only
    projections; the anti-join build side broadcasts."""
    work = (
        team_game_log_df.filter(
            (F.col("SEASON") == season) & (F.col("SEASON_TYPE") == season_type)
        )
        .select("GAME_ID")
        .distinct()
    )
    if existing is None:
        return work
    return delta_filter(work, existing, ["GAME_ID"])
