"""Declared schemas for the six reference tables (FIXTURES.md).

The reference infers every schema at write time (pandas ``to_sql``,
reference ``database/db_client.py:43-54``); this engine declares them.
``GAME_ID`` is a zero-padded 10-char STRING everywhere (casting it to
int silently breaks season decoding — reference ``utils/utils.py:66-79``).
``STINTS`` is a native array<struct> instead of the reference's JSON
string (``etl/rotations.py:13``); ``to_json``/``from_json`` only at a
compatibility boundary.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- shared column groups -------------------------------------------------

def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


STINT = T.StructType(
    [
        _f("IN_TIME_REAL", T.DoubleType(), False),   # tenths of a second from game start
        _f("OUT_TIME_REAL", T.DoubleType(), False),
    ]
)

# team_game_log: one row per (game, team); id = GAME_ID-TEAM_ID
TEAM_GAME_LOG = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("GAME_ID", T.StringType(), False),
        _f("TEAM_ID", T.LongType(), False),
        _f("TEAM_ABBREVIATION", T.StringType()),
        _f("TEAM_NAME", T.StringType()),
        _f("GAME_DATE", T.StringType()),
        _f("MATCHUP", T.StringType()),  # 'vs' => home, '@' => away
        _f("WL", T.StringType()),
        _f("PTS", T.DoubleType()),
        _f("PLUS_MINUS", T.DoubleType()),
        _f("SEASON", T.StringType(), False),
        _f("SEASON_TYPE", T.StringType(), False),
    ]
)

# play_by_play: one row per event; id = GAME_ID-EVENTNUM
PLAY_BY_PLAY = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("GAME_ID", T.StringType(), False),
        _f("EVENTNUM", T.LongType(), False),
        _f("EVENTMSGTYPE", T.LongType(), False),       # 8=sub, 10=jump ball, 12=period start
        _f("EVENTMSGACTIONTYPE", T.LongType(), False),
        _f("PERIOD", T.LongType(), False),
        _f("WCTIMESTRING", T.StringType()),
        _f("PCTIMESTRING", T.StringType()),            # countdown clock 'MM:SS'
        _f("HOMEDESCRIPTION", T.StringType()),
        _f("NEUTRALDESCRIPTION", T.StringType()),
        _f("VISITORDESCRIPTION", T.StringType()),
        _f("SCORE", T.StringType()),
        _f("SCOREMARGIN", T.StringType()),
        _f("PLAYER1_ID", T.LongType()),
        _f("PLAYER1_NAME", T.StringType()),
        _f("PLAYER1_TEAM_ID", T.LongType()),
        _f("PLAYER2_ID", T.LongType()),
        _f("PLAYER2_NAME", T.StringType()),
        _f("PLAYER2_TEAM_ID", T.LongType()),
        _f("PLAYER3_ID", T.LongType()),
        _f("PLAYER3_NAME", T.StringType()),
        _f("PLAYER3_TEAM_ID", T.LongType()),
        _f("SEASON", T.StringType(), False),
        _f("SEASON_TYPE", T.StringType(), False),
    ]
)

# rotations: one row per (game, player) after stint roll-up; id = GAME_ID-PLAYER_ID
ROTATIONS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("GAME_ID", T.StringType(), False),
        _f("TEAM_ID", T.LongType(), False),
        _f("TEAM_NAME", T.StringType()),
        _f("PLAYER_ID", T.LongType(), False),
        _f("PLAYER_FIRST", T.StringType()),
        _f("PLAYER_LAST", T.StringType()),
        _f("STINTS", T.ArrayType(STINT), False),
        _f("SEASON", T.StringType(), False),
        _f("SEASON_TYPE", T.StringType(), False),
    ]
)

# pre-aggregation rotation rows (gamerotation API shape, game_rotation.csv)
ROTATION_RAW = T.StructType(
    [
        _f("GAME_ID", T.StringType(), False),
        _f("TEAM_ID", T.LongType(), False),
        _f("TEAM_CITY", T.StringType()),
        _f("TEAM_NAME", T.StringType()),
        _f("PERSON_ID", T.LongType(), False),
        _f("PLAYER_FIRST", T.StringType()),
        _f("PLAYER_LAST", T.StringType()),
        _f("IN_TIME_REAL", T.DoubleType(), False),
        _f("OUT_TIME_REAL", T.DoubleType(), False),
        _f("PLAYER_PTS", T.DoubleType()),
        _f("PT_DIFF", T.DoubleType()),
        _f("USG_PCT", T.DoubleType()),
    ]
)

# players_on_court_at_start_of_period: exactly 10 rows per (game, period)
PLAYERS_ON_COURT = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("GAME_ID", T.StringType(), False),
        _f("SEASON", T.StringType(), False),
        _f("SEASON_TYPE", T.StringType(), False),
        _f("PERIOD", T.LongType(), False),
        _f("PLAYER_ID", T.LongType(), False),
        _f("TEAM_ID", T.LongType(), False),
    ]
)

# shot_details: one row per FGA; id = PLAYER_ID-GAME_ID-GAME_EVENT_ID
SHOT_DETAILS = T.StructType(
    [
        _f("id", T.StringType(), False),
        _f("GAME_ID", T.StringType(), False),
        _f("GAME_EVENT_ID", T.LongType(), False),
        _f("PLAYER_ID", T.LongType(), False),
        _f("TEAM_ID", T.LongType(), False),
        _f("LOC_X", T.DoubleType()),
        _f("LOC_Y", T.DoubleType()),
        _f("SHOT_DISTANCE", T.DoubleType()),
        _f("SHOT_MADE_FLAG", T.LongType()),
        _f("SHOT_TYPE", T.StringType()),
        _f("SHOT_ZONE_BASIC", T.StringType()),
        _f("SEASON", T.StringType(), False),
        _f("SEASON_TYPE", T.StringType(), False),
    ]
)

# play_by_play_with_players: PLAY_BY_PLAY + seconds-from-start + 10 lineup cols
PBP_WITH_PLAYERS = T.StructType(
    list(PLAY_BY_PLAY.fields)
    + [_f("SECONDS_FROM_START", T.LongType(), False)]
    + [_f(f"TEAM1_PLAYER{i}", T.LongType(), False) for i in range(1, 6)]
    + [_f(f"TEAM2_PLAYER{i}", T.LongType(), False) for i in range(1, 6)]
)

TABLES = {
    "team_game_log": TEAM_GAME_LOG,
    "play_by_play": PLAY_BY_PLAY,
    "rotations": ROTATIONS,
    "players_on_court_at_start_of_period": PLAYERS_ON_COURT,
    "shot_details": SHOT_DETAILS,
    "play_by_play_with_players": PBP_WITH_PLAYERS,
}

# Partition layout replacing the reference's b-tree indexes on
# (SEASON, SEASON_TYPE, GAME_ID) — reference database/db_client.py:94-123.
# SEASON/SEASON_TYPE become partition columns (=> partition pruning);
# GAME_ID predicates are served by parquet row-group min/max stats.
PARTITION_COLS = ("SEASON", "SEASON_TYPE")
