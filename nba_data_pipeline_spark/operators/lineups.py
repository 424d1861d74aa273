"""Lineup analytics: who is on the floor at every play-by-play event.

Re-expresses the reference's derived-analytics centerpiece
(``etl/play_by_play_with_players.py`` and
``etl/players_on_court_at_start_of_period.py``) Spark-first:

- home/away resolution (reference :49-79) -> relational
  first-jump-ball + MATCHUP-parse with ``coalesce`` (O6);
- starters-per-period (reference :73-122) -> window first-event +
  role CASE (O2), no per-player loops;
- lineup tracking (reference :113-165) -> two implementations:
  (a) ``track_lineups``: exact-semantics per-game stateful scan via
      cogrouped ``applyInPandas`` (games are independent ~500-row
      groups — the ideal Arrow batch grain; parallelism = #games);
  (b) ``lineups_via_range_join``: declarative explode-stints +
      interval join + pivot — pure Catalyst, the 100-TB scale path.
  (a) is the correctness anchor; tests cross-check (b) against it.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.data import spread_by_key
from ..functions.timeops import clock_to_seconds, seconds_to_tenths
from ..operators.rollup import explode_stints

LINEUP_COLS = [f"TEAM1_PLAYER{i}" for i in range(1, 6)] + [
    f"TEAM2_PLAYER{i}" for i in range(1, 6)
]


def lineup_expectations(counts: bool = False) -> dict:
    """The reference's hard lineup invariant
    (etl/play_by_play_with_players.py:146-149 raises unless every event
    carries exactly five players per team) as ``quality.validate``
    expectations — one conditional-aggregate scan instead of a per-game
    raise. ``five_per_team``: all ten lineup slots non-null (a missing
    stint or failed fallback leaves trailing slots null).
    ``ten_distinct_players``: the ten ids are pairwise distinct (a
    duplicated or team-crossed id means corrupt stints). Run them on
    the tracked frame BEFORE null-filling.

    The five slot columns cannot express an OVER-full floor: the pivot
    truncates a 6th on-court player, so the slots alone look healthy.
    ``lineups_via_range_join`` therefore carries the pre-pivot set
    sizes as TEAM1_ON_COURT / TEAM2_ON_COURT; pass ``counts=True`` on
    frames that have them to also assert ``exactly_five_on_court``."""
    all_set = F.lit(True)
    for c in LINEUP_COLS:
        all_set = all_set & F.col(c).isNotNull()
    distinct10 = (
        F.size(F.array_distinct(F.array(*[F.col(c) for c in LINEUP_COLS]))) == 10
    )
    exps = {"five_per_team": all_set, "ten_distinct_players": distinct10}
    if counts:
        exps["exactly_five_on_court"] = (F.col("TEAM1_ON_COURT") == 5) & (
            F.col("TEAM2_ON_COURT") == 5
        )
    return exps


def derive_seconds_from_start(pbp: DataFrame) -> DataFrame:
    """Attach SECONDS_FROM_START from (PERIOD, PCTIMESTRING) — pure
    Column expr, replaces the reference's row-wise apply (:116)."""
    return pbp.withColumn(
        "SECONDS_FROM_START", clock_to_seconds("PERIOD", "PCTIMESTRING")
    )


def resolve_game_teams(pbp: DataFrame, team_game_log: DataFrame | None = None) -> DataFrame:
    """Per-game (GAME_ID, TEAM1_ID home, TEAM2_ID away).

    Primary: first opening-jump-ball row (EVENTMSGTYPE=10,
    EVENTMSGACTIONTYPE=0): PLAYER1_TEAM_ID is home. Fallback:
    team_game_log MATCHUP — 'vs' row is home, '@' row is away
    (reference :49-79). Both paths are tiny per-game aggregates that
    broadcast into the event join.
    """
    w = Window.partitionBy("GAME_ID").orderBy("PERIOD", "SECONDS_FROM_START", "EVENTNUM")
    jump = (
        pbp.filter((F.col("EVENTMSGTYPE") == 10) & (F.col("EVENTMSGACTIONTYPE") == 0))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "GAME_ID",
            F.col("PLAYER1_TEAM_ID").alias("_jump_home"),
            F.col("PLAYER2_TEAM_ID").alias("_jump_away"),
        )
    )
    if team_game_log is None:
        return jump.select(
            "GAME_ID",
            F.col("_jump_home").alias("TEAM1_ID"),
            F.col("_jump_away").alias("TEAM2_ID"),
        )
    matchup = (
        team_game_log.groupBy("GAME_ID").agg(
            F.max(F.when(F.col("MATCHUP").contains("vs"), F.col("TEAM_ID"))).alias("_m_home"),
            F.max(F.when(F.col("MATCHUP").contains("@"), F.col("TEAM_ID"))).alias("_m_away"),
        )
    )
    games = pbp.select("GAME_ID").distinct()
    return (
        games.join(jump, "GAME_ID", "left")
        .join(matchup, "GAME_ID", "left")
        .select(
            "GAME_ID",
            F.coalesce("_jump_home", "_m_home").alias("TEAM1_ID"),
            F.coalesce("_jump_away", "_m_away").alias("TEAM2_ID"),
        )
    )


# ---------------------------------------------------------------------------
# O2: players on court at the start of each period (pbp-only variant)
# ---------------------------------------------------------------------------

def _first_sub_role(pbp: DataFrame) -> DataFrame:
    """Per (GAME_ID, PERIOD, PLAYER_ID): role of the player's first
    substitution event in the period — 'OUT' if they are PLAYER1 (subbed
    out), 'IN' if PLAYER2 (subbed in). Ordered by (time, event) exactly
    as the reference sorts subs (etl/players_on_court_at_start_of_period.py:67).
    """
    subs = pbp.filter(F.col("EVENTMSGTYPE") == 8)
    roles = subs.select(
        "GAME_ID", "PERIOD", "SECONDS_FROM_START", "EVENTNUM",
        F.col("PLAYER1_ID").alias("PLAYER_ID"), F.lit("OUT").alias("ROLE"),
    ).unionByName(
        subs.select(
            "GAME_ID", "PERIOD", "SECONDS_FROM_START", "EVENTNUM",
            F.col("PLAYER2_ID").alias("PLAYER_ID"), F.lit("IN").alias("ROLE"),
        )
    )
    w = Window.partitionBy("GAME_ID", "PERIOD", "PLAYER_ID").orderBy(
        "SECONDS_FROM_START", "EVENTNUM"
    )
    return (
        roles.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("GAME_ID", "PERIOD", "PLAYER_ID", F.col("ROLE").alias("FIRST_ROLE"))
    )


def starters_per_period(pbp: DataFrame) -> DataFrame:
    """Period starters from substitution order alone (reference
    ``get_starters_for_period_pbp``, :90-122), relationally:

    candidates = distinct (player, team) seen in any PLAYERn slot in the
    period (team != 0); a candidate started the period iff their first
    substitution event in the period (ordered by time, event) has them
    going OUT (PLAYER1 slot) — or they have no sub event at all.
    One shuffle on (GAME_ID, PERIOD); the reference loops per player
    per period with a DB round-trip each.
    """
    pbp = pbp if "SECONDS_FROM_START" in pbp.columns else derive_seconds_from_start(pbp)
    cand = None
    for n in (1, 2, 3):
        proj = pbp.select(
            "GAME_ID",
            "PERIOD",
            F.col(f"PLAYER{n}_ID").alias("PLAYER_ID"),
            F.col(f"PLAYER{n}_TEAM_ID").alias("TEAM_ID"),
        )
        cand = proj if cand is None else cand.unionByName(proj)
    cand = cand.filter(
        F.col("TEAM_ID").isNotNull() & (F.col("TEAM_ID") != 0) & F.col("PLAYER_ID").isNotNull()
    ).dropDuplicates(["GAME_ID", "PERIOD", "PLAYER_ID", "TEAM_ID"])

    first_role = _first_sub_role(pbp)
    return (
        cand.join(first_role, ["GAME_ID", "PERIOD", "PLAYER_ID"], "left")
        .filter(F.col("FIRST_ROLE").isNull() | (F.col("FIRST_ROLE") == "OUT"))
        .select("GAME_ID", "PERIOD", "PLAYER_ID", "TEAM_ID")
    )


def starters_per_period_box_seeded(pbp: DataFrame, box: DataFrame) -> DataFrame:
    """Period starters seeded from the per-period box score — the
    reference's PRIMARY variant (``get_starters_for_period``,
    etl/players_on_court_at_start_of_period.py:73-88):

    candidates = box rows with ``MIN IS NOT NULL`` (played in the
    period); a candidate started the period iff they have no sub event
    in it, or their first sub (by time, event) is OUT. TEAM_ID comes
    from the box score (reference :137), not pbp.

    ``box`` needs (GAME_ID, PERIOD, PLAYER_ID, TEAM_ID, MIN). The box
    side is typically tiny relative to pbp (≤ ~30 rows per game-period)
    so the join broadcasts under AQE; the sub-role side shuffles once
    on (GAME_ID, PERIOD, PLAYER_ID).
    """
    pbp = pbp if "SECONDS_FROM_START" in pbp.columns else derive_seconds_from_start(pbp)
    cand = (
        box.filter(F.col("MIN").isNotNull())
        .select("GAME_ID", "PERIOD", "PLAYER_ID", "TEAM_ID")
        .dropDuplicates(["GAME_ID", "PERIOD", "PLAYER_ID"])
    )
    first_role = _first_sub_role(pbp)
    return (
        cand.join(first_role, ["GAME_ID", "PERIOD", "PLAYER_ID"], "left")
        .filter(F.col("FIRST_ROLE").isNull() | (F.col("FIRST_ROLE") == "OUT"))
        .select("GAME_ID", "PERIOD", "PLAYER_ID", "TEAM_ID")
    )


def starters_with_fallback(pbp: DataFrame, box: DataFrame) -> DataFrame:
    """Box-seeded starters with pbp fallback — the reference's
    ``process_game`` control flow (etl/players_on_court_at_start_of_period.py:125-161):
    use the box-seeded answer when it finds exactly 10 starters for the
    period; otherwise fall back to the pbp-only algorithm, again
    accepting only an exact-10 answer. Periods where neither variant
    yields 10 are dropped (the reference raises and skips the game;
    in a distributed batch we drop the period — callers can diff
    against ``pbp.select('GAME_ID','PERIOD').distinct()`` to audit).

    Emits a SOURCE column ('box' | 'pbp') so downstream can tell which
    path produced each period. All counting is window-local per
    (GAME_ID, PERIOD) — no driver round-trips, unlike the reference's
    per-period API + DB calls.
    """
    wb = Window.partitionBy("GAME_ID", "PERIOD")
    b = (
        starters_per_period_box_seeded(pbp, box)
        .withColumn("_n", F.count("*").over(wb))
    )
    good_box = b.filter(F.col("_n") == 10).drop("_n").withColumn("SOURCE", F.lit("box"))
    box_ok_periods = good_box.select("GAME_ID", "PERIOD").dropDuplicates()
    p = (
        starters_per_period(pbp)
        .withColumn("_n", F.count("*").over(wb))
    )
    good_pbp = (
        p.filter(F.col("_n") == 10)
        .drop("_n")
        .join(box_ok_periods, ["GAME_ID", "PERIOD"], "left_anti")
        .withColumn("SOURCE", F.lit("pbp"))
    )
    return good_box.unionByName(good_pbp)


def starters_from_rotations(rotations: DataFrame) -> DataFrame:
    """Period starters from stint containment (the data source the
    reference says supersedes the pbp algorithm, reference :9-11):
    a player starts period p iff some stint covers p's start instant.
    Periods are derived per game from the max stint end."""
    from ..functions.timeops import period_start_seconds

    stints = explode_stints(rotations)
    periods = (
        stints.groupBy("GAME_ID")
        .agg(F.max("OUT_TIME_REAL").alias("_max_out"))
        .select(
            "GAME_ID",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.lit(4)
                    + F.greatest(
                        F.lit(0),
                        F.ceil((F.col("_max_out") - 28800.0) / 3000.0).cast("int"),
                    ),
                )
            ).alias("PERIOD"),
        )
    )
    start_tenths = (period_start_seconds("PERIOD") * 10).cast("double")
    on_court = (
        stints.join(periods, "GAME_ID")
        .filter(
            (F.col("IN_TIME_REAL") <= start_tenths) & (start_tenths < F.col("OUT_TIME_REAL"))
        )
        .select("GAME_ID", "PERIOD", "PLAYER_ID", "TEAM_ID")
        .dropDuplicates(["GAME_ID", "PERIOD", "PLAYER_ID"])
    )
    return on_court


# ---------------------------------------------------------------------------
# O3(a): exact-semantics per-game stateful scan (applyInPandas)
# ---------------------------------------------------------------------------

def _make_track_fn(event_cols: list[str]):
    """Build the cogrouped per-game function. ``event_cols`` is the
    full left-side column list; output appends the 10 lineup columns.
    """

    def track(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out_cols = event_cols + LINEUP_COLS
        if left.empty:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        ev = left.sort_values(["PERIOD", "SECONDS_FROM_START", "EVENTNUM"]).reset_index(
            drop=True
        )
        team1 = ev["TEAM1_ID"].iloc[0]
        team2 = ev["TEAM2_ID"].iloc[0]
        stints = right[right["KIND"] == "stint"]
        fallback = right[right["KIND"] == "fallback"]

        # index the stint boundaries once per game: the event loop then
        # does O(1) dict lookups instead of a pandas filter per period
        # boundary (x4 filters per boundary x periods x games)
        in_map: dict[tuple, set] = {}
        out_map: dict[tuple, set] = {}
        for team_id, pid, t_in, t_out in zip(
            stints["TEAM_ID"], stints["PLAYER_ID"],
            stints["IN_TIME_REAL"], stints["OUT_TIME_REAL"],
        ):
            in_map.setdefault((team_id, t_in), set()).add(pid)
            out_map.setdefault((team_id, t_out), set()).add(pid)
        fb_map: dict[tuple, set] = {}
        for team_id, period, pid in zip(
            fallback["TEAM_ID"], fallback["PERIOD"], fallback["PLAYER_ID"]
        ):
            fb_map.setdefault((team_id, period), set()).add(pid)

        def initial(team_id):
            return sorted(in_map.get((team_id, 0.0), ()))

        def boundary(team_id, tenths, col):
            m = out_map if col == "OUT_TIME_REAL" else in_map
            return m.get((team_id, tenths), set())

        def fallback_lineup(team_id, period):
            pids = fb_map.get((team_id, period))
            return sorted(pids) if pids else None

        lineups = {team1: initial(team1), team2: initial(team2)}
        emitted: dict[str, list] = {c: [] for c in LINEUP_COLS}
        for row in ev.itertuples(index=False):
            etype = row.EVENTMSGTYPE
            if etype == 8:  # substitution: PLAYER1 out, PLAYER2 in
                t_team = row.PLAYER1_TEAM_ID
                if t_team in lineups:
                    cur = lineups[t_team]
                    if row.PLAYER1_ID not in cur:
                        raise ValueError(
                            f"sub of absent player {row.PLAYER1_ID} at event "
                            f"{row.EVENTNUM} (on court: {cur})"
                        )
                    cur.remove(row.PLAYER1_ID)
                    cur.append(row.PLAYER2_ID)
                    cur.sort()
            elif etype == 12:  # period boundary: apply stint starts/ends
                tenths = float(row.SECONDS_FROM_START * 10)
                for team in (team1, team2):
                    cur = [p for p in lineups[team] if p not in boundary(team, tenths, "OUT_TIME_REAL")]
                    for pid in boundary(team, tenths, "IN_TIME_REAL"):
                        if pid not in cur:
                            cur.append(pid)
                    if len(cur) != 5:
                        fb = fallback_lineup(team, row.PERIOD)
                        if fb is not None:
                            cur = fb
                    lineups[team] = sorted(cur)
            # reference hard invariant (play_by_play_with_players.py:
            # 146-149): an OVER-full floor would be silently truncated
            # by the 5-slot emission below, so it must raise here;
            # under-full floors emit trailing nulls that the
            # five_per_team validation gate catches downstream.
            for tm in (team1, team2):
                cur_tm = lineups[tm]
                if cur_tm is not None and len(cur_tm) > 5:
                    raise ValueError(
                        f"{len(cur_tm)} players on court for team {tm} at "
                        f"event {row.EVENTNUM} (reference invariant: 5)"
                    )
            for i in range(5):
                emitted[f"TEAM1_PLAYER{i + 1}"].append(
                    lineups[team1][i] if i < len(lineups[team1]) else None
                )
                emitted[f"TEAM2_PLAYER{i + 1}"].append(
                    lineups[team2][i] if i < len(lineups[team2]) else None
                )
        for c in LINEUP_COLS:
            ev[c] = pd.array(emitted[c], dtype="Int64")
        return ev[out_cols]

    return track


# Columns the per-game stateful scan actually reads; everything else is
# payload that only inflates the Arrow transfer into Python.
_SCAN_COLS = [
    "GAME_ID", "EVENTNUM", "EVENTMSGTYPE", "PERIOD", "SECONDS_FROM_START",
    "PLAYER1_ID", "PLAYER1_TEAM_ID", "PLAYER2_ID", "TEAM1_ID", "TEAM2_ID",
]


def track_lineups(
    pbp: DataFrame,
    rotations: DataFrame,
    team_game_log: DataFrame | None = None,
    fallback_lineups: DataFrame | None = None,
    slim: bool = True,
) -> DataFrame:
    """play_by_play + rotations -> play_by_play_with_players.

    Exact reference semantics (etl/play_by_play_with_players.py:113-165)
    as a cogrouped ``applyInPandas`` over GAME_ID: events and exploded
    stints meet in one shuffle each; the per-game scan runs where the
    data lives (no driver loops, no mid-scan lookups — the reference's
    fallback query at :147-149 is pre-joined via ``fallback_lineups``,
    SURVEY.md §7.4 known-hard #2).

    With ``slim`` (default), only the 10 columns the scan reads cross
    the Arrow boundary; the wide event payload (descriptions, names,
    scores) is joined back on (GAME_ID, EVENTNUM) afterwards — at scale
    the Python transfer is the bottleneck, not the equi-join.
    """
    pbp = pbp if "SECONDS_FROM_START" in pbp.columns else derive_seconds_from_start(pbp)
    teams = resolve_game_teams(pbp, team_game_log)
    events = pbp.join(F.broadcast(teams), "GAME_ID", "inner")
    wide_cols = [c for c in events.columns if c not in ("TEAM1_ID", "TEAM2_ID")]
    if slim and set(wide_cols) - set(_SCAN_COLS):
        slim_events = events.select(*_SCAN_COLS)
        tracked = _track_on(slim_events, rotations, fallback_lineups)
        lineup_only = tracked.select("GAME_ID", "EVENTNUM", *LINEUP_COLS)
        return pbp.join(lineup_only, ["GAME_ID", "EVENTNUM"], "inner")
    return _track_on(events, rotations, fallback_lineups).drop("TEAM1_ID", "TEAM2_ID")


def _track_on(
    events: DataFrame,
    rotations: DataFrame,
    fallback_lineups: DataFrame | None,
) -> DataFrame:
    """Cogrouped applyInPandas core: ``events`` must already carry
    TEAM1_ID/TEAM2_ID and SECONDS_FROM_START; output = events columns +
    the 10 lineup columns."""
    stints = explode_stints(rotations.select("GAME_ID", "TEAM_ID", "PLAYER_ID", "STINTS"))
    side = stints.select(
        "GAME_ID",
        "TEAM_ID",
        "PLAYER_ID",
        "IN_TIME_REAL",
        "OUT_TIME_REAL",
        F.lit("stint").alias("KIND"),
        F.lit(None).cast("long").alias("PERIOD"),
    )
    if fallback_lineups is not None:
        side = side.unionByName(
            fallback_lineups.select(
                "GAME_ID",
                "TEAM_ID",
                "PLAYER_ID",
                F.lit(None).cast("double").alias("IN_TIME_REAL"),
                F.lit(None).cast("double").alias("OUT_TIME_REAL"),
                F.lit("fallback").alias("KIND"),
                F.col("PERIOD").cast("long").alias("PERIOD"),
            )
        )

    event_cols = events.columns
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in events.schema.fields]
        + [f"{c} long" for c in LINEUP_COLS]
    )
    # pin the cogroup exchanges at an explicit width (r16, guide §4):
    # AQE's partition coalescing sizes shuffles by BYTES, and a few MB
    # of events coalesce to one partition — which serializes the
    # per-game Python scan onto a single worker (measured 3.5s -> 1.3s
    # at the 200-game bench grain). An explicit numPartitions opts the
    # exchange out of coalescing; the per-game Python cost is what the
    # byte-sizing heuristic cannot see.
    events = spread_by_key(events, "GAME_ID", always=True)
    side = spread_by_key(side, "GAME_ID", always=True)
    return (
        events.groupBy("GAME_ID")
        .cogroup(side.groupBy("GAME_ID"))
        .applyInPandas(_make_track_fn(event_cols), schema=out_schema)
    )


# ---------------------------------------------------------------------------
# O3(b): declarative explode + range-join + pivot (the scale path)
# ---------------------------------------------------------------------------

def lineups_via_range_join(
    pbp: DataFrame,
    rotations: DataFrame,
    team_game_log: DataFrame | None = None,
    fallback_lineups: DataFrame | None = None,
) -> DataFrame:
    """Lineups purely relationally, with EVENT-ORDER interval bounds.

    The stateful scan (and the reference,
    etl/play_by_play_with_players.py:118) applies a roster change at its
    *event position* in (PERIOD, SECONDS_FROM_START, EVENTNUM) order —
    not at its timestamp. A timestamp interval predicate diverges
    whenever an event shares a clock second with a roster change (the
    common multi-sub timeout). So each stint bound is first ANCHORED to
    the position of the event that applies it:

    - a mid-period bound anchors to the substitution event (type 8)
      whose (team, player, time) matches it — the scan applies subs at
      their event (reference :131-141);
    - a period-boundary bound anchors to the first period-start event
      (type 12) at that exact time — the scan applies stint starts/ends
      there (reference :142-152);
    - when both exist, the earlier position wins (the scan's second
      application is an idempotent no-op);
    - an unanchored bound (inconsistent pbp/rotations data) falls back
      to the timestamp comparison, except a game-ending OUT (== the
      game's max stint end, which the scan never removes) stays on
      court through the final event.

    A player is then on the floor at event e iff
    in_anchor <= pos(e) < out_anchor. Collect the five player ids per
    (event, team) with ``sort_array(collect_set)`` and pivot into the 10
    fixed columns. Event-by-event equal to ``track_lineups`` on
    consistent data, including multiple roster changes inside one clock
    second (property-tested in tests/test_lineup_property.py).

    Plan shape: one per-game window for positions (its exchange is
    reused by the GAME_ID joins), three stint-sized anchor joins, one
    events-to-stints join, one aggregation by event — no per-group
    Python at all. This is the 100-TB path.

    ``fallback_lineups`` (GAME_ID, TEAM_ID, PERIOD, PLAYER_ID — the
    players_on_court_at_start_of_period table) enables the reference's
    per-period repair (etl/play_by_play_with_players.py:142-152): any
    team-period whose stint-reconstructed floor at the period's type-12
    boundary is not exactly five players is re-seeded from the fallback
    roster, with that period's substitutions toggling membership from
    their event positions — matching the stateful scan's repaired-then-
    mutated behavior (property-tested on inconsistent-stint fixtures).
    """
    pbp = pbp if "SECONDS_FROM_START" in pbp.columns else derive_seconds_from_start(pbp)
    teams = resolve_game_teams(pbp, team_game_log)
    wpos = Window.partitionBy("GAME_ID").orderBy("PERIOD", "SECONDS_FROM_START", "EVENTNUM")
    # slim position-keyed event frame: feeds the sub/period anchors and
    # the stint join (3 plan branches — checkpoint so the window isn't
    # recomputed per branch; only 11 narrow columns cross it)
    keyed = (
        pbp.select(
            "GAME_ID", "EVENTNUM", "EVENTMSGTYPE", "PERIOD", "SECONDS_FROM_START",
            "PLAYER1_ID", "PLAYER1_TEAM_ID", "PLAYER2_ID",
        )
        .join(F.broadcast(teams), "GAME_ID", "inner")
        .withColumn("_tenths", seconds_to_tenths("SECONDS_FROM_START").cast("double"))
        .withColumn("_pos", F.row_number().over(wpos))
        # ONE GAME_ID shuffle feeds the entire plan. Every downstream
        # window, aggregation, and join here keys on a GAME_ID-prefixed
        # tuple, and a hash partitioning on a subset of the required
        # clustering keys satisfies ClusteredDistribution (joins need
        # requireAllClusterKeysForCoPartition=false, set in
        # core/session.py) — so all of them run with in-partition sorts
        # only. persist()+count(), NOT localCheckpoint: the
        # checkpoint's ExistingRDD reports UnknownPartitioning, which
        # re-inserted an exchange per consumer branch (measured: 19
        # Exchanges / 17 Sorts before this change); a MATERIALIZED
        # InMemoryRelation exposes the window's hashpartitioning to
        # every branch (unmaterialized, AQE hides it) and still
        # computes the window once for the plan's six consumers.
        .persist()
    )
    keyed.count()
    stints = explode_stints(
        rotations.select("GAME_ID", "TEAM_ID", "PLAYER_ID", "STINTS")
    ).repartition("GAME_ID").persist()  # same trick, stint scale
    stints.count()

    subs = keyed.filter(F.col("EVENTMSGTYPE") == 8)
    # Rank-match sub events to stint bounds: when a player has several
    # same-(team, player, time) bounds (in-out-in within one second),
    # the k-th sub event in position order pairs with the k-th stint in
    # chronological order. With unique bounds every rank is 1 and this
    # is a plain equi-join. The scan applies both sides of a sub to
    # PLAYER1_TEAM_ID's lineup.
    sub_out = subs.select(
        "GAME_ID",
        F.col("PLAYER1_TEAM_ID").alias("TEAM_ID"),
        F.col("PLAYER1_ID").alias("PLAYER_ID"),
        F.col("_tenths").alias("OUT_TIME_REAL"),
        F.col("_pos").alias("_out_sub"),
    ).withColumn(
        "_out_rk",
        F.row_number().over(
            Window.partitionBy("GAME_ID", "TEAM_ID", "PLAYER_ID", "OUT_TIME_REAL")
            .orderBy("_out_sub")
        ),
    )
    sub_in = subs.select(
        "GAME_ID",
        F.col("PLAYER1_TEAM_ID").alias("TEAM_ID"),
        F.col("PLAYER2_ID").alias("PLAYER_ID"),
        F.col("_tenths").alias("IN_TIME_REAL"),
        F.col("_pos").alias("_in_sub"),
    ).withColumn(
        "_in_rk",
        F.row_number().over(
            Window.partitionBy("GAME_ID", "TEAM_ID", "PLAYER_ID", "IN_TIME_REAL")
            .orderBy("_in_sub")
        ),
    )
    pb = (
        keyed.filter(F.col("EVENTMSGTYPE") == 12)
        .groupBy("GAME_ID", "_tenths")
        .agg(F.min("_pos").alias("_pb"))
    )
    game_end = stints.groupBy("GAME_ID").agg(F.max("OUT_TIME_REAL").alias("_game_end"))
    stints_ranked = stints.withColumn(
        "_in_rk",
        F.row_number().over(
            Window.partitionBy("GAME_ID", "TEAM_ID", "PLAYER_ID", "IN_TIME_REAL")
            .orderBy("OUT_TIME_REAL")
        ),
    ).withColumn(
        "_out_rk",
        F.row_number().over(
            Window.partitionBy("GAME_ID", "TEAM_ID", "PLAYER_ID", "OUT_TIME_REAL")
            .orderBy("IN_TIME_REAL")
        ),
    )
    anchored = (
        stints_ranked.join(
            sub_in, ["GAME_ID", "TEAM_ID", "PLAYER_ID", "IN_TIME_REAL", "_in_rk"], "left"
        )
        .join(
            sub_out, ["GAME_ID", "TEAM_ID", "PLAYER_ID", "OUT_TIME_REAL", "_out_rk"], "left"
        )
        .join(
            pb.withColumnRenamed("_tenths", "IN_TIME_REAL").withColumnRenamed("_pb", "_in_pb"),
            ["GAME_ID", "IN_TIME_REAL"],
            "left",
        )
        .join(
            pb.withColumnRenamed("_tenths", "OUT_TIME_REAL").withColumnRenamed("_pb", "_out_pb"),
            ["GAME_ID", "OUT_TIME_REAL"],
            "left",
        )
        .join(game_end, "GAME_ID", "left")
        .withColumn("_in_anchor", F.least("_in_sub", "_in_pb"))
        .withColumn("_out_anchor", F.least("_out_sub", "_out_pb"))
    )

    open_ok = F.when(
        F.col("_in_anchor").isNotNull(), F.col("_pos") >= F.col("_in_anchor")
    ).otherwise(F.col("IN_TIME_REAL") <= F.col("_tenths"))
    close_ok = F.when(
        F.col("_out_anchor").isNotNull(), F.col("_pos") < F.col("_out_anchor")
    ).otherwise(
        (F.col("_tenths") < F.col("OUT_TIME_REAL"))
        | (F.col("OUT_TIME_REAL") >= F.col("_game_end"))
    )
    joined = keyed.join(anchored, "GAME_ID").filter(open_ok & close_ok)
    members = joined.select(
        "GAME_ID", "PERIOD", "EVENTNUM", "_pos",
        "TEAM1_ID", "TEAM2_ID", "TEAM_ID", "PLAYER_ID",
    )

    if fallback_lineups is not None:
        # Per-period fallback repair, reference semantics
        # (etl/play_by_play_with_players.py:142-152): at the period's
        # type-12 boundary event the scan applies the stint deltas and,
        # if the resulting floor is not exactly five, replaces the whole
        # team lineup with the pre-joined period-lineup row; subsequent
        # substitutions then mutate that repaired floor. Declaratively:
        # a (game, period, team) is BROKEN iff the stint-interval
        # membership at the boundary event is != 5 and a fallback row
        # exists; for broken team-periods the stint membership from the
        # boundary onward is replaced by intervals seeded from the
        # fallback roster and toggled by the period's type-8 subs.
        # Every repair-side frame is stint/sub/roster-sized (tiny next
        # to events), so the extra joins broadcast; the one touch on the
        # big side is a broadcast anti-join of `members`.
        fb = fallback_lineups.select(
            "GAME_ID",
            F.col("PERIOD").cast("long").alias("PERIOD"),
            "TEAM_ID",
            "PLAYER_ID",
        )
        b12 = (
            keyed.filter(F.col("EVENTMSGTYPE") == 12)
            .groupBy("GAME_ID", "PERIOD")
            .agg(F.min("_pos").alias("_bpos"))
        )
        pend = keyed.groupBy("GAME_ID", "PERIOD").agg(
            (F.max("_pos") + 1).alias("_pend")
        )
        # (game, period, team) universe at each boundary — a team with
        # ZERO reconstructed players yields no membership row, and that
        # absence must still read as broken
        uni = b12.join(F.broadcast(teams), "GAME_ID").select(
            "GAME_ID", "PERIOD", "_bpos",
            F.explode(F.array("TEAM1_ID", "TEAM2_ID")).alias("TEAM_ID"),
        )
        bcnt = (
            members.join(b12, ["GAME_ID", "PERIOD"])
            .filter(F.col("_pos") == F.col("_bpos"))
            .groupBy("GAME_ID", "PERIOD", "TEAM_ID")
            .agg(F.count_distinct("PLAYER_ID").alias("_n"))
        )
        brk = (
            uni.join(bcnt, ["GAME_ID", "PERIOD", "TEAM_ID"], "left")
            .filter(F.coalesce(F.col("_n"), F.lit(0)) != 5)
            .join(fb.select("GAME_ID", "PERIOD", "TEAM_ID"),
                  ["GAME_ID", "PERIOD", "TEAM_ID"], "semi")
            .join(pend, ["GAME_ID", "PERIOD"])
            .select("GAME_ID", "PERIOD", "TEAM_ID", "_bpos", "_pend")
        )
        # sub toggles inside broken team-periods: the k-th OUT of a
        # player closes the k-th open interval (the fallback seat counts
        # as interval 1 for roster members), the k-th IN opens the next
        subp = (
            keyed.filter(F.col("EVENTMSGTYPE") == 8)
            .select(
                "GAME_ID", "PERIOD",
                F.col("PLAYER1_TEAM_ID").alias("TEAM_ID"),
                F.col("PLAYER1_ID").alias("_out_pid"),
                F.col("PLAYER2_ID").alias("_in_pid"),
                "_pos",
            )
            .join(brk.select("GAME_ID", "PERIOD", "TEAM_ID"),
                  ["GAME_ID", "PERIOD", "TEAM_ID"], "semi")
        )
        pkeys = ["GAME_ID", "PERIOD", "TEAM_ID", "PLAYER_ID"]
        wplayer = Window.partitionBy(*pkeys).orderBy("_pos")
        outs = (
            subp.select("GAME_ID", "PERIOD", "TEAM_ID",
                        F.col("_out_pid").alias("PLAYER_ID"), "_pos")
            .withColumn("_lrk", F.row_number().over(wplayer))
            .select(*pkeys, F.col("_pos").alias("_rpos"), "_lrk")
        )
        base = (
            fb.join(brk, ["GAME_ID", "PERIOD", "TEAM_ID"], "inner")
            .select(*pkeys, F.col("_bpos").alias("_lpos"),
                    F.lit(1).alias("_lrk"))
        )
        ins = (
            subp.select("GAME_ID", "PERIOD", "TEAM_ID",
                        F.col("_in_pid").alias("PLAYER_ID"), "_pos")
            .withColumn("_ink", F.row_number().over(wplayer))
            .join(base.select(*pkeys, F.lit(1).alias("_is_base")),
                  pkeys, "left")
            .withColumn("_lrk", F.col("_ink")
                        + F.when(F.col("_is_base") == 1, 1).otherwise(0))
            .select(*pkeys, F.col("_pos").alias("_lpos"), "_lrk")
        )
        intervals = (
            base.unionByName(ins)
            .join(outs, pkeys + ["_lrk"], "left")
            .join(brk.select("GAME_ID", "PERIOD", "TEAM_ID", "_pend"),
                  ["GAME_ID", "PERIOD", "TEAM_ID"], "inner")
            .withColumn("_rend", F.coalesce("_rpos", "_pend"))
            .select(*pkeys, "_lpos", "_rend")
        )
        keep = members.join(
            brk,
            (members["GAME_ID"] == brk["GAME_ID"])
            & (members["PERIOD"] == brk["PERIOD"])
            & (members["TEAM_ID"] == brk["TEAM_ID"])
            & (members["_pos"] >= brk["_bpos"]),
            "left_anti",
        )
        repaired = (
            keyed.select("GAME_ID", "PERIOD", "EVENTNUM", "_pos",
                         "TEAM1_ID", "TEAM2_ID")
            .join(intervals, ["GAME_ID", "PERIOD"])
            .filter((F.col("_pos") >= F.col("_lpos"))
                    & (F.col("_pos") < F.col("_rend")))
            .select("GAME_ID", "PERIOD", "EVENTNUM", "_pos",
                    "TEAM1_ID", "TEAM2_ID", "TEAM_ID", "PLAYER_ID")
        )
        members = keep.unionByName(repaired)

    per_event = (
        members.groupBy("GAME_ID", "EVENTNUM")
        .agg(
            F.sort_array(
                F.collect_set(
                    F.when(F.col("TEAM_ID") == F.col("TEAM1_ID"), F.col("PLAYER_ID"))
                )
            ).alias("_t1"),
            F.sort_array(
                F.collect_set(
                    F.when(F.col("TEAM_ID") == F.col("TEAM2_ID"), F.col("PLAYER_ID"))
                )
            ).alias("_t2"),
        )
    )
    out = pbp.join(per_event, ["GAME_ID", "EVENTNUM"], "left")
    for i in range(5):
        # F.get, not getItem: under Spark 4's default ANSI mode getItem
        # raises on an under-full array, which would make the documented
        # trailing-null + five_per_team validation path unreachable
        out = out.withColumn(f"TEAM1_PLAYER{i + 1}", F.get("_t1", i))
        out = out.withColumn(f"TEAM2_PLAYER{i + 1}", F.get("_t2", i))
    # pre-pivot set sizes: the five slots silently truncate a 6th
    # on-court player (corrupt stints), so the counts are the only
    # place over-full floors remain visible — see lineup_expectations
    out = out.withColumn("TEAM1_ON_COURT", F.size("_t1")).withColumn(
        "TEAM2_ON_COURT", F.size("_t2")
    )
    return out.drop("_t1", "_t2")
