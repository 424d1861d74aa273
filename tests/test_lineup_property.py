"""Randomized-game cross-check of the two lineup implementations.

Generates consistent (pbp, rotations) pairs — random substitution
schedules with matching stint intervals — and asserts the exact
stateful scan (track_lineups) and the declarative range-join
formulation agree event-by-event. This is the dual-implementation
fidelity check for the operator the DuckDB oracle can't express
(SURVEY.md §7.4 #6).

The generator deliberately produces the tie cases that broke the
timestamp-interval formulation (VERDICT r2 #1):
- 2-3 substitutions inside ONE clock second (multi-sub timeouts);
- non-sub events in the same second as a sub, both BEFORE the sub in
  event order (must still see the old lineup) and after it;
- a player subbed in and back out within the same second (zero-width
  stint — on court only for the events between the two subs);
- an end-of-game event at the exact final-whistle second (game-ending
  stints are never closed by the scan).
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
    """Random but consistent game: 8 players a side; substitution
    moments at random seconds, each moment holding 1-3 subs that all
    share the clock second, with optional non-sub events interleaved
    before/between/after them in event order. Returns
    (pbp_rows, stint_rows)."""
    stints = {}  # (team, pid) -> list[[in, out]]
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

    def do_sub(sec, team, moved):
        # out_p may be a player subbed IN earlier this same second
        # (prob ~0.3 when possible) — that creates a zero-width stint
        # [t, t] the anchor resolution must pair correctly; in_p is
        # always a not-yet-moved bench player so no player enters twice
        # in one second (the one pairing that is genuinely ambiguous)
        re_out = [p for p in on_court[team] if p in moved]
        fresh_out = [p for p in on_court[team] if p not in moved]
        if re_out and fresh_out:
            out_p = rng.choice(re_out) if rng.random() < 0.3 else rng.choice(fresh_out)
        else:
            out_p = rng.choice(re_out or fresh_out)
        in_p = rng.choice([p for p in bench[team] if p not in moved])
        moved.update((out_p, in_p))
        t = float(sec * 10)
        stints[(team, out_p)][-1][1] = t
        stints.setdefault((team, in_p), []).append([t, float(END_T)])
        on_court[team].remove(out_p)
        on_court[team].append(in_p)
        bench[team].remove(in_p)
        bench[team].append(out_p)
        return out_p, in_p

    # timeline of (sec, kind) built in event order; eventnums assigned
    # sequentially afterwards so ties-in-time are broken by EVENTNUM
    # exactly as the scan sorts them
    moment_seconds = sorted(
        rng.sample(range(30, 690), 3) + [720 + s for s in rng.sample(range(30, 690), 3)]
    )
    timeline = [("start1", 0), ("jump", 0)]
    filler_budget = [s for s in range(1, 1439) if s not in set(moment_seconds) and s != 720]
    for sec in moment_seconds:
        if rng.random() < 0.7:
            timeline.append(("filler", sec))  # same second, BEFORE the sub(s)
        n_subs = rng.choice([1, 2, 2, 3])
        moved = set()
        for k in range(n_subs):
            period, _ = clock(sec)
            team = rng.choice([HOME, AWAY])
            out_p, in_p = do_sub(sec, team, moved)
            timeline.append(("sub", sec, team, out_p, in_p))
            if k < n_subs - 1 and rng.random() < 0.5:
                timeline.append(("filler", sec))  # between two same-second subs
        if rng.random() < 0.7:
            timeline.append(("filler", sec))  # same second, after the sub(s)
    for sec in rng.sample(filler_budget, 12):
        timeline.append(("filler", sec))
    timeline.append(("start2", 720))
    timeline.append(("end", 1440))  # final whistle at the exact game-end second
    # order: by second, then period starts before same-second play (the
    # start2 row belongs to period 2 whose events all have sec >= 720),
    # then original insertion order (stable sort keeps sub sequences)
    timeline.sort(key=lambda e: (e[1], 0 if e[0] in ("start1", "start2") else 1))

    pbp = []
    eventnum = 0
    for ev in timeline:
        kind, sec = ev[0], ev[1]
        eventnum += rng.choice([1, 2, 5])
        period, pc = clock(sec) if kind not in ("start1", "jump") else (1, "12:00")
        if kind in ("start1", "start2"):
            pbp.append((gid, eventnum, 12, 0, period, pc, 0, 0, 0, 0))
        elif kind == "jump":
            pbp.append((gid, eventnum, 10, 0, 1, "12:00", HOME + 1, HOME, AWAY + 1, AWAY))
        elif kind == "sub":
            _, _, team, out_p, in_p = ev
            pbp.append((gid, eventnum, 8, 0, period, pc, out_p, team, in_p, team))
        elif kind == "end":
            pbp.append((gid, eventnum, 13, 0, 2, "0:00", 0, 0, 0, 0))
        else:
            pbp.append((gid, eventnum, 1, 0, period, pc, 0, 0, 0, 0))

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


def _truth_starters(stint_rows):
    """Fallback-lineup rows (GAME_ID, TEAM_ID, PERIOD, PLAYER_ID) from
    the UNCORRUPTED stints: a player starts period p iff some stint
    covers p's first instant."""
    rows = []
    for gid, team, pid, ss in stint_rows:
        for period, ps in ((1, 0.0), (2, 7200.0)):
            if any(lo <= ps < hi for lo, hi in ss):
                rows.append((gid, team, period, pid))
    return rows


def _corrupt_period2(stint_rows, rng):
    """Per game: truncate one period-2-crossing stint at the boundary,
    so the stint data UNDERSTATES the period-2 floor (the reference's
    repair trigger, etl/play_by_play_with_players.py:147-149). Returns
    (corrupted_rows, n_corrupted)."""
    out, corrupted = [], 0
    by_game: dict = {}
    for row in stint_rows:
        by_game.setdefault(row[0], []).append(row)
    for gid, rows in by_game.items():
        # pick the first player (stable under seed) on court across the
        # period boundary
        victim = None
        for i, (g, team, pid, ss) in enumerate(rows):
            if any(lo <= 7200.0 < hi for lo, hi in ss):
                victim = i
                break
        for i, (g, team, pid, ss) in enumerate(rows):
            if i == victim:
                ss = [
                    (lo, 7200.0 if lo <= 7200.0 < hi else hi)
                    for lo, hi in ss
                    if not (lo >= 7200.0 and lo <= 7200.0 < hi)
                ]
                corrupted += 1
            out.append((g, team, pid, ss))
    return out, corrupted


def test_inconsistent_stints_repair_parity(spark):
    """Declarative == exact WITH the per-period fallback repair engaged
    (VERDICT r8 task #3): stints corrupted so the reconstructed period-2
    floor is 4 players, fallback table = truth starters. Both engines
    must repair to the fallback roster at the period boundary and keep
    mutating it with that period's substitutions."""
    rng = random.Random(20260814)
    all_pbp, all_stints, all_corrupt, all_fb = [], [], [], []
    for g in range(8):
        pbp, stints = simulate_game(rng, f"00225{g:05d}")
        corrupt, n = _corrupt_period2(stints, rng)
        assert n == 1
        all_pbp.extend(pbp)
        all_stints.extend(stints)
        all_corrupt.extend(corrupt)
        all_fb.extend(_truth_starters(stints))
    pbp_df = spark.createDataFrame(
        all_pbp,
        "GAME_ID string, EVENTNUM long, EVENTMSGTYPE long, EVENTMSGACTIONTYPE long,"
        "PERIOD long, PCTIMESTRING string, PLAYER1_ID long, PLAYER1_TEAM_ID long,"
        "PLAYER2_ID long, PLAYER2_TEAM_ID long",
    )
    rot_df = spark.createDataFrame(
        all_corrupt,
        "GAME_ID string, TEAM_ID long, PLAYER_ID long,"
        "STINTS array<struct<IN_TIME_REAL: double, OUT_TIME_REAL: double>>",
    )
    fb_df = spark.createDataFrame(
        all_fb, "GAME_ID string, TEAM_ID long, PERIOD long, PLAYER_ID long"
    )
    cols = ["GAME_ID", "EVENTNUM"] + [
        f"TEAM{t}_PLAYER{i}" for t in (1, 2) for i in range(1, 6)
    ]

    def snap(df):
        return {
            (r["GAME_ID"], r["EVENTNUM"]): tuple(r[c] for c in cols[2:])
            for r in df.select(*cols).collect()
        }

    # without repair the declarative floor is under-full in period 2
    # (trailing nulls) — the corruption actually bites
    unrepaired = snap(lineups_via_range_join(pbp_df, rot_df))
    assert any(None in v for v in unrepaired.values())

    exact = snap(track_lineups(pbp_df, rot_df, fallback_lineups=fb_df))
    declarative = snap(
        lineups_via_range_join(pbp_df, rot_df, fallback_lineups=fb_df)
    )
    assert set(exact) == set(declarative)
    diffs = {k for k in exact if exact[k] != declarative[k]}
    assert not diffs, f"{len(diffs)} mismatching events, e.g. {sorted(diffs)[:3]}"
    # the repair restores a full 5+5 floor on every event
    assert all(None not in v for v in declarative.values())
