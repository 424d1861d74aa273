"""Declared resultSet schemas for the main NBA stats endpoints.

The reference takes whatever columns the API returns and lets pandas
infer dtypes (``api/smart.py:566-578``); the engine declares the
columns its pipelines actually consume (FIXTURES.md "required"
columns) plus stable passthroughs, in wire order, so
``sources.resultset.result_set_df`` can pivot positional rows into
typed frames. ``fetch_typed`` closes the loop: game ids -> distributed
fetch -> decode -> typed DataFrame ready for plans/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .nba_api import Fetcher, fetch_many
from .resultset import decode_result_sets, result_set_df


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


LONG, STR, DBL = T.LongType(), T.StringType(), T.DoubleType()

# playbyplayv2 -> PlayByPlay (reference api/smart.py:411-425)
PLAY_BY_PLAY_SET = _s(
    ("GAME_ID", STR), ("EVENTNUM", LONG), ("EVENTMSGTYPE", LONG),
    ("EVENTMSGACTIONTYPE", LONG), ("PERIOD", LONG), ("WCTIMESTRING", STR),
    ("PCTIMESTRING", STR), ("HOMEDESCRIPTION", STR), ("NEUTRALDESCRIPTION", STR),
    ("VISITORDESCRIPTION", STR), ("SCORE", STR), ("SCOREMARGIN", STR),
    ("PERSON1TYPE", LONG), ("PLAYER1_ID", LONG), ("PLAYER1_NAME", STR),
    ("PLAYER1_TEAM_ID", LONG), ("PERSON2TYPE", LONG), ("PLAYER2_ID", LONG),
    ("PLAYER2_NAME", STR), ("PLAYER2_TEAM_ID", LONG), ("PERSON3TYPE", LONG),
    ("PLAYER3_ID", LONG), ("PLAYER3_NAME", STR), ("PLAYER3_TEAM_ID", LONG),
)

# leaguegamelog -> LeagueGameLog (reference api/smart.py:427-457)
LEAGUE_GAME_LOG_SET = _s(
    ("SEASON_ID", STR), ("TEAM_ID", LONG), ("TEAM_ABBREVIATION", STR),
    ("TEAM_NAME", STR), ("GAME_ID", STR), ("GAME_DATE", STR), ("MATCHUP", STR),
    ("WL", STR), ("MIN", DBL), ("PTS", DBL), ("PLUS_MINUS", DBL),
)

# gamerotation -> HomeTeam/AwayTeam (reference api/smart.py:129-134;
# shape = game_rotation.csv header)
GAME_ROTATION_SET = _s(
    ("GAME_ID", STR), ("TEAM_ID", LONG), ("TEAM_CITY", STR), ("TEAM_NAME", STR),
    ("PERSON_ID", LONG), ("PLAYER_FIRST", STR), ("PLAYER_LAST", STR),
    ("IN_TIME_REAL", DBL), ("OUT_TIME_REAL", DBL), ("PLAYER_PTS", DBL),
    ("PT_DIFF", DBL), ("USG_PCT", DBL),
)

# shotchartdetail -> Shot_Chart_Detail (reference api/smart.py:493-546)
SHOT_CHART_SET = _s(
    ("GRID_TYPE", STR), ("GAME_ID", STR), ("GAME_EVENT_ID", LONG),
    ("PLAYER_ID", LONG), ("PLAYER_NAME", STR), ("TEAM_ID", LONG),
    ("TEAM_NAME", STR), ("PERIOD", LONG), ("MINUTES_REMAINING", LONG),
    ("SECONDS_REMAINING", LONG), ("EVENT_TYPE", STR), ("ACTION_TYPE", STR),
    ("SHOT_TYPE", STR), ("SHOT_ZONE_BASIC", STR), ("SHOT_ZONE_AREA", STR),
    ("SHOT_ZONE_RANGE", STR), ("SHOT_DISTANCE", DBL), ("LOC_X", DBL),
    ("LOC_Y", DBL), ("SHOT_ATTEMPTED_FLAG", LONG), ("SHOT_MADE_FLAG", LONG),
)

# boxscoretraditionalv2 -> PlayerStats (reference api/smart.py:306-330)
BOX_PLAYER_STATS_SET = _s(
    ("GAME_ID", STR), ("TEAM_ID", LONG), ("TEAM_ABBREVIATION", STR),
    ("TEAM_CITY", STR), ("PLAYER_ID", LONG), ("PLAYER_NAME", STR),
    ("START_POSITION", STR), ("COMMENT", STR), ("MIN", STR), ("PTS", DBL),
    ("REB", DBL), ("AST", DBL), ("PLUS_MINUS", DBL),
)

# playergamelogs -> PlayerGameLogs, Base-measure wire-order prefix
# (reference api/smart.py:358-390 season box-score composites; extra
# trailing wire columns are ignored by the positional pivot, same
# assumption the reference's pandas decode makes)
PLAYER_GAME_LOGS_SET = _s(
    ("SEASON_YEAR", STR), ("PLAYER_ID", LONG), ("PLAYER_NAME", STR), ("NICKNAME", STR),
    ("TEAM_ID", LONG), ("TEAM_ABBREVIATION", STR), ("TEAM_NAME", STR), ("GAME_ID", STR),
    ("GAME_DATE", STR), ("MATCHUP", STR), ("WL", STR), ("MIN", DBL),
    ("FGM", DBL), ("FGA", DBL), ("FG_PCT", DBL), ("FG3M", DBL), ("FG3A", DBL),
    ("FG3_PCT", DBL), ("FTM", DBL), ("FTA", DBL), ("FT_PCT", DBL), ("OREB", DBL),
    ("DREB", DBL), ("REB", DBL), ("AST", DBL), ("TOV", DBL), ("STL", DBL),
    ("BLK", DBL), ("PTS", DBL), ("PLUS_MINUS", DBL),
)

RESULT_SET_SCHEMAS: dict[str, dict[str, T.StructType]] = {
    "play_by_play": {"PlayByPlay": PLAY_BY_PLAY_SET},
    "teams_game_log": {"LeagueGameLog": LEAGUE_GAME_LOG_SET},
    "player_game_log": {"LeagueGameLog": LEAGUE_GAME_LOG_SET},
    "game_rotation": {
        "HomeTeam": GAME_ROTATION_SET,
        "AwayTeam": GAME_ROTATION_SET,
    },
    "shot_chart_detail": {"Shot_Chart_Detail": SHOT_CHART_SET},
    "foul_chart_detail": {"Shot_Chart_Detail": SHOT_CHART_SET},
    "box_score_traditional": {"PlayerStats": BOX_PLAYER_STATS_SET},
    "season_box_scores": {"PlayerGameLogs": PLAYER_GAME_LOGS_SET},
}


def fetch_season_box_scores(
    spark,
    fetcher: Fetcher,
    season: str,
    season_type: str,
    measure_type: str = "Base",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Season-level box-score composite (reference api/smart.py:358-390
    ``get_season_traditional_box_score`` / ``get_season_advanced_box_score``):
    ONE playergamelogs call per (season, type, measure) — no game fan-out —
    whose payload decodes distributedly into the declared frame.
    Pass ``schema`` for non-Base measure types (their wire order differs).
    """
    from .nba_api import ENDPOINTS, season_box_score_params
    from .resultset import payloads_from_json_strings

    ep = ENDPOINTS["season_box_scores"]
    payload = fetcher(ep.path, season_box_score_params(season, season_type, measure_type))
    decoded = decode_result_sets(payloads_from_json_strings(spark, [payload]))
    return result_set_df(decoded, "PlayerGameLogs", schema or PLAYER_GAME_LOGS_SET)


def fetch_typed(
    game_ids: DataFrame,
    endpoint_name: str,
    fetcher: Fetcher,
    result_set: str | None = None,
    **params: str,
) -> DataFrame:
    """game ids -> distributed fetch -> decode -> typed DataFrame.

    ``result_set`` picks one set when the endpoint has several (e.g.
    gamerotation HomeTeam/AwayTeam); defaults to the endpoint's only
    declared set. Multiple sets with the same schema (rotation home+away)
    can be fetched once and unioned by calling per set name.
    """
    sets = RESULT_SET_SCHEMAS[endpoint_name]
    if result_set is None:
        if len(sets) != 1:
            raise ValueError(f"{endpoint_name} has sets {list(sets)}; pick one")
        result_set = next(iter(sets))
    payloads = fetch_many(game_ids, endpoint_name, fetcher, **params)
    decoded = decode_result_sets(payloads.select("payload"))
    return result_set_df(decoded, result_set, sets[result_set])
