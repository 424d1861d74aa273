"""Randomized-game cross-check of the two lineup implementations.

Generates consistent (pbp, rotations) pairs — random substitution
schedules with matching stint intervals — and asserts the exact
stateful scan (track_lineups) and the declarative range-join
formulation agree event-by-event. This is the dual-implementation
fidelity check for the operator the DuckDB oracle can't express
(SURVEY.md §7.4 #6). Sub times are kept distinct per game so the two
formulations' same-second tie semantics can't diverge.
"""

import random

from nba_data_pipeline_spark.operators.lineups import (
    lineups_via_range_join,
    track_lineups,
)

HOME, AWAY = 100, 200
GAME_SECONDS = 1440  # two 12-minute periods
END_T = GAME_SECONDS * 10


def simulate_game(rng: random.Random, gid: str):
    """Random but consistent game: 8 players a side, random in-period
    subs at distinct seconds, plus a possible roster swap at the period
    break. Returns (pbp_rows, stint_rows)."""
    pbp = [
        # period starts + opening jump
        (gid, 1, 12, 0, 1, "12:00", 0, 0, 0, 0),
        (gid, 2, 10, 0, 1, "12:00", HOME + 1, HOME, AWAY + 1, AWAY),
        (gid, 5000, 12, 0, 2, "12:00", 0, 0, 0, 0),
    ]
    stints = {}  # (team, pid) -> list[[in, out]]
    eventnum = 10
    sub_seconds = rng.sample(range(30, 690), 6) + [
        720 + s for s in rng.sample(range(30, 690), 6)
    ]
    sub_iter = iter(sorted(sub_seconds))

    for team in (HOME, AWAY):
        for i in range(5):
            stints[(team, team + 1 + i)] = [[0.0, float(END_T)]]

    on_court = {
        HOME: [HOME + 1 + i for i in range(5)],
        AWAY: [AWAY + 1 + i for i in range(5)],
    }
    bench = {
        HOME: [HOME + 6, HOME + 7, HOME + 8],
        AWAY: [AWAY + 6, AWAY + 7, AWAY + 8],
    }

    def clock(sec):
        period = 1 if sec < 720 else 2
        rem = (720 if period == 1 else 1440) - sec
        return period, f"{rem // 60}:{rem % 60:02d}"

    for sec in sorted(sub_seconds):
        team = rng.choice([HOME, AWAY])
        out_p = rng.choice(on_court[team])
        in_p = rng.choice(bench[team])
        period, pc = clock(sec)
        nonlocal_t = float(sec * 10)
        # close the outgoing player's open stint, open the incoming one's
        stints[(team, out_p)][-1][1] = nonlocal_t
        stints.setdefault((team, in_p), []).append([nonlocal_t, float(END_T)])
        on_court[team].remove(out_p)
        on_court[team].append(in_p)
        bench[team].remove(in_p)
        bench[team].append(out_p)
        pbp.append((gid, eventnum, 8, 0, period, pc, out_p, team, in_p, team))
        eventnum += 10
        _ = sub_iter  # noqa: B018

    # filler non-sub events at distinct times
    used = set(sub_seconds)
    for sec in rng.sample([s for s in range(1, 1439) if s not in used], 20):
        period, pc = clock(sec)
        pbp.append((gid, eventnum, 1, 0, period, pc, 0, 0, 0, 0))
        eventnum += 10

    stint_rows = [
        (gid, team, pid, [(lo, hi) for lo, hi in ss])
        for (team, pid), ss in stints.items()
    ]
    return pbp, stint_rows


def test_random_games_stateful_equals_declarative(spark):
    rng = random.Random(20260813)
    all_pbp, all_stints = [], []
    for g in range(12):
        pbp, stints = simulate_game(rng, f"00224{g:05d}")
        all_pbp.extend(pbp)
        all_stints.extend(stints)
    pbp_df = spark.createDataFrame(
        all_pbp,
        "GAME_ID string, EVENTNUM long, EVENTMSGTYPE long, EVENTMSGACTIONTYPE long,"
        "PERIOD long, PCTIMESTRING string, PLAYER1_ID long, PLAYER1_TEAM_ID long,"
        "PLAYER2_ID long, PLAYER2_TEAM_ID long",
    )
    rot_df = spark.createDataFrame(
        all_stints,
        "GAME_ID string, TEAM_ID long, PLAYER_ID long,"
        "STINTS array<struct<IN_TIME_REAL: double, OUT_TIME_REAL: double>>",
    )
    cols = ["GAME_ID", "EVENTNUM"] + [
        f"TEAM{t}_PLAYER{i}" for t in (1, 2) for i in range(1, 6)
    ]

    def snap(df):
        return {
            (r["GAME_ID"], r["EVENTNUM"]): tuple(r[c] for c in cols[2:])
            for r in df.select(*cols).collect()
        }

    exact = snap(track_lineups(pbp_df, rot_df))
    declarative = snap(lineups_via_range_join(pbp_df, rot_df))
    assert set(exact) == set(declarative)
    diffs = {k for k in exact if exact[k] != declarative[k]}
    assert not diffs, f"{len(diffs)} mismatching events, e.g. {sorted(diffs)[:3]}"
    # sanity: every event has 5+5 players
    assert all(None not in v for v in exact.values())
