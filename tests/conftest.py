from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_data_pipeline_spark.core.session import get_session  # noqa: E402
from nba_data_pipeline_spark.core import schemas  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
    s = get_session("tests")
    yield s


# ---------------------------------------------------------------------------
# Synthetic NBA game (FIXTURES.md invariants): 2 teams x 8 players,
# 2 regulation periods, scripted subs. Hand-verifiable lineups:
#   home (100): starters 101-105; 101->106 at 300s; 102->107 at P2 start
#   away (200): starters 201-205; 202->206 at 500s; 206->202 at P2 start
# ---------------------------------------------------------------------------

GAME_ID = "0022400001"
HOME, AWAY = 100, 200


def _pbp_row(eventnum, etype, action, period, clock, p1=0, p1t=0, p2=0, p2t=0, p3=0, p3t=0):
    return {
        "GAME_ID": GAME_ID, "EVENTNUM": eventnum, "EVENTMSGTYPE": etype,
        "EVENTMSGACTIONTYPE": action, "PERIOD": period, "WCTIMESTRING": "7:00 PM",
        "PCTIMESTRING": clock, "HOMEDESCRIPTION": None, "NEUTRALDESCRIPTION": None,
        "VISITORDESCRIPTION": None, "SCORE": None, "SCOREMARGIN": None,
        "PLAYER1_ID": p1, "PLAYER1_NAME": None, "PLAYER1_TEAM_ID": p1t,
        "PLAYER2_ID": p2, "PLAYER2_NAME": None, "PLAYER2_TEAM_ID": p2t,
        "PLAYER3_ID": p3, "PLAYER3_NAME": None, "PLAYER3_TEAM_ID": p3t,
    }


PBP_ROWS = [
    _pbp_row(1, 12, 0, 1, "12:00"),
    _pbp_row(2, 10, 0, 1, "12:00", p1=103, p1t=HOME, p2=203, p2t=AWAY),
    _pbp_row(5, 1, 0, 1, "10:00", p1=104, p1t=HOME),           # made shot
    _pbp_row(10, 8, 0, 1, "7:00", p1=101, p1t=HOME, p2=106, p2t=HOME),   # sub 300s
    _pbp_row(15, 1, 0, 1, "5:00", p1=205, p1t=AWAY),
    _pbp_row(20, 8, 0, 1, "3:40", p1=202, p1t=AWAY, p2=206, p2t=AWAY),   # sub 500s
    _pbp_row(25, 1, 0, 1, "1:00", p1=106, p1t=HOME),
    _pbp_row(100, 12, 0, 2, "12:00"),
    _pbp_row(105, 1, 0, 2, "11:00", p1=202, p1t=AWAY),
    _pbp_row(110, 1, 0, 2, "6:30", p1=107, p1t=HOME),
]

# stints in tenths of a second; [IN, OUT)
STINTS = {
    (HOME, 101): [(0.0, 3000.0)],
    (HOME, 102): [(0.0, 7200.0)],
    (HOME, 103): [(0.0, 14400.0)],
    (HOME, 104): [(0.0, 14400.0)],
    (HOME, 105): [(0.0, 14400.0)],
    (HOME, 106): [(3000.0, 14400.0)],
    (HOME, 107): [(7200.0, 14400.0)],
    (AWAY, 201): [(0.0, 14400.0)],
    (AWAY, 202): [(0.0, 5000.0), (7200.0, 14400.0)],
    (AWAY, 203): [(0.0, 14400.0)],
    (AWAY, 204): [(0.0, 14400.0)],
    (AWAY, 205): [(0.0, 14400.0)],
    (AWAY, 206): [(5000.0, 7200.0)],
}


@pytest.fixture(scope="session")
def pbp_df(spark):
    df = spark.createDataFrame(
        [tuple(r.values()) for r in PBP_ROWS],
        schema=(
            "GAME_ID string, EVENTNUM long, EVENTMSGTYPE long, EVENTMSGACTIONTYPE long,"
            "PERIOD long, WCTIMESTRING string, PCTIMESTRING string, HOMEDESCRIPTION string,"
            "NEUTRALDESCRIPTION string, VISITORDESCRIPTION string, SCORE string,"
            "SCOREMARGIN string, PLAYER1_ID long, PLAYER1_NAME string, PLAYER1_TEAM_ID long,"
            "PLAYER2_ID long, PLAYER2_NAME string, PLAYER2_TEAM_ID long,"
            "PLAYER3_ID long, PLAYER3_NAME string, PLAYER3_TEAM_ID long"
        ),
    )
    return df


@pytest.fixture(scope="session")
def rotations_df(spark):
    rows = [
        (GAME_ID, team, "Team", pid, "First", "Last", stints)
        for (team, pid), stints in STINTS.items()
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "GAME_ID string, TEAM_ID long, TEAM_NAME string, PLAYER_ID long,"
            "PLAYER_FIRST string, PLAYER_LAST string,"
            "STINTS array<struct<IN_TIME_REAL: double, OUT_TIME_REAL: double>>"
        ),
    )


@pytest.fixture(scope="session")
def rotation_raw_df(spark):
    rows = [
        (GAME_ID, team, "City", "Team", pid, "First", "Last", s_in, s_out, 0.0, 0.0, 0.1)
        for (team, pid), stints in STINTS.items()
        for (s_in, s_out) in stints
    ]
    return spark.createDataFrame(rows, schema=schemas.ROTATION_RAW)


@pytest.fixture(scope="session")
def team_game_log_df(spark):
    rows = [
        (GAME_ID, HOME, "AAA", "Alphas", "2024-10-25", "AAA vs. BBB", "W", 100.0, 5.0),
        (GAME_ID, AWAY, "BBB", "Betas", "2024-10-25", "BBB @ AAA", "L", 95.0, -5.0),
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "GAME_ID string, TEAM_ID long, TEAM_ABBREVIATION string, TEAM_NAME string,"
            "GAME_DATE string, MATCHUP string, WL string, PTS double, PLUS_MINUS double"
        ),
    )
