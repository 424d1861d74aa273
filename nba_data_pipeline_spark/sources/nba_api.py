"""Parameterized NBA stats endpoint registry (ingest layer).

Re-expresses the reference's 16 typed endpoints (``api/smart.py:129-546``)
as a declarative registry: each endpoint is (path, param builder,
target resultSet). Fetching is pluggable — tests inject a fixture
fetcher; production uses HTTP with the same retry/backoff contract as
the reference (10 attempts, 10 s timeout — ``api/smart.py:548-583``)
plus a token-bucket rate limit (the reference defines SLEEP_TIME but
never uses it, ``utils/utils.py:17,62-63``).

For game-level fan-out at scale, ``fetch_many`` distributes game ids
as a DataFrame and runs the fetcher inside ``mapInPandas`` partitions,
so thousands of HTTP calls run executor-side with per-task retry —
the Spark-native version of the reference's ThreadPoolExecutor.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_URL = "https://stats.nba.com/stats"

# Enum constants (reference api/smart.py:11-84 classes -> plain dicts)
SEASON_TYPES = ("Regular Season", "Playoffs", "Pre Season", "IST")
PER_MODES = ("Totals", "PerGame", "Per100Possessions")
MEASURE_TYPES = ("Base", "Advanced", "Misc", "Scoring", "Usage")
PT_MEASURE_TYPES = ("SpeedDistance", "Rebounding", "Possessions", "CatchShoot",
                    "PullUpShot", "Defense", "Drives", "Passing", "ElbowTouch",
                    "PostTouch", "PaintTouch", "Efficiency")

DEFAULT_HEADERS = {
    "User-Agent": "Mozilla/5.0",
    "Referer": "https://stats.nba.com/",
    "Accept": "application/json",
}

# Franchise name -> stats.nba.com team id (reference api/smart.py:11-46
# ``NBATeams``). Ints here; parameter builders stringify at the HTTP
# boundary like every other id.
NBA_TEAMS: dict[str, int] = {
    "AtlantaHawks": 1610612737,
    "BostonCeltics": 1610612738,
    "BrooklynNets": 1610612751,
    "CharlotteHornets": 1610612766,
    "ChicagoBulls": 1610612741,
    "ClevelandCavaliers": 1610612739,
    "DallasMavericks": 1610612742,
    "DenverNuggets": 1610612743,
    "DetroitPistons": 1610612765,
    "GoldenStateWarriors": 1610612744,
    "HoustonRockets": 1610612745,
    "IndianaPacers": 1610612754,
    "LosAngelesClippers": 1610612746,
    "LosAngelesLakers": 1610612747,
    "MemphisGrizzlies": 1610612763,
    "MiamiHeat": 1610612748,
    "MilwaukeeBucks": 1610612749,
    "MinnesotaTimberwolves": 1610612750,
    "NewOrleansPelicans": 1610612740,
    "NewYorkKnicks": 1610612752,
    "OklahomaCityThunder": 1610612760,
    "OrlandoMagic": 1610612753,
    "Philadelphia76ers": 1610612755,
    "PhoenixSuns": 1610612756,
    "PortlandTrailBlazers": 1610612757,
    "SacramentoKings": 1610612758,
    "SanAntonioSpurs": 1610612759,
    "TorontoRaptors": 1610612761,
    "UtahJazz": 1610612762,
    "WashingtonWizards": 1610612764,
}

_TEAMS_NORMALIZED = {name.lower(): tid for name, tid in NBA_TEAMS.items()}


def resolve_team_id(team: int | str) -> int:
    """Accept a raw stats.nba.com team id (int or digit string) or a
    franchise name in any spacing/casing ('GoldenStateWarriors',
    'golden state warriors', 'Golden_State_Warriors')."""
    if isinstance(team, int):
        return team
    s = str(team).strip()
    if s.isdigit():
        return int(s)
    key = s.replace(" ", "").replace("_", "").replace("-", "").lower()
    if key in _TEAMS_NORMALIZED:
        return _TEAMS_NORMALIZED[key]
    raise ValueError(
        f"unknown team {team!r}; expected a team id or one of {sorted(NBA_TEAMS)}"
    )


@dataclass(frozen=True)
class Endpoint:
    path: str
    result_set: str | None  # None = keep all sets
    defaults: tuple[tuple[str, str], ...] = ()
    # per-endpoint request timeout: the reference overrides its 10 s
    # default to 45 s for leagueseasonmatchups (api/smart.py:478), the
    # one endpoint whose server-side aggregation routinely exceeds 10 s
    timeout: float = 10.0

    def params(self, **overrides: str) -> dict[str, str]:
        out = dict(self.defaults)
        out.update({k: str(v) for k, v in overrides.items()})
        return out


ENDPOINTS: dict[str, Endpoint] = {
    "game_rotation": Endpoint("gamerotation", None, (("LeagueID", "00"),)),
    "team_season_totals": Endpoint(
        "leaguedashteamstats", "LeagueDashTeamStats",
        (("LeagueID", "00"), ("PerMode", "Totals"), ("MeasureType", "Base")),
    ),
    "player_season_totals": Endpoint(
        "leaguedashplayerstats", "LeagueDashPlayerStats",
        (("LeagueID", "00"), ("PerMode", "Totals"), ("MeasureType", "Base")),
    ),
    "player_season_tracking": Endpoint(
        "leaguedashptstats", "LeagueDashPtStats",
        (("LeagueID", "00"), ("PerMode", "Totals"), ("PlayerOrTeam", "Player")),
    ),
    "team_season_tracking": Endpoint(
        "leaguedashptstats", "LeagueDashPtStats",
        (("LeagueID", "00"), ("PerMode", "Totals"), ("PlayerOrTeam", "Team")),
    ),
    "shooting_dashboard": Endpoint(
        "leaguedashplayerptshot", "LeagueDashPTShots",
        (("LeagueID", "00"), ("PerMode", "Totals")),
    ),
    "box_score_traditional": Endpoint("boxscoretraditionalv2", None, ()),
    "box_score_advanced": Endpoint("boxscoreadvancedv2", None, ()),
    "win_probability": Endpoint("winprobabilitypbp", None, ()),
    "player_game_log": Endpoint("leaguegamelog", "LeagueGameLog",
                                (("LeagueID", "00"), ("PlayerOrTeam", "P"),
                                 ("Sorter", "DATE"), ("Direction", "ASC"))),
    "teams_game_log": Endpoint("leaguegamelog", "LeagueGameLog",
                               (("LeagueID", "00"), ("PlayerOrTeam", "T"),
                                ("Sorter", "DATE"), ("Direction", "ASC"))),
    "play_by_play": Endpoint("playbyplayv2", "PlayByPlay",
                             (("StartPeriod", "0"), ("EndPeriod", "14"))),
    "defensive_matchups": Endpoint("leagueseasonmatchups", "SeasonMatchups",
                                   (("LeagueID", "00"), ("PerMode", "Totals")),
                                   timeout=45.0),
    "shot_chart_detail": Endpoint("shotchartdetail", "Shot_Chart_Detail",
                                  (("LeagueID", "00"), ("ContextMeasure", "FGA"))),
    "foul_chart_detail": Endpoint("shotchartdetail", "Shot_Chart_Detail",
                                  (("LeagueID", "00"), ("ContextMeasure", "PF"))),
    # Season-level box-score composite (reference api/smart.py:358-390
    # get_season_traditional/advanced_box_score -> one playergamelogs
    # call per season, MeasureType selects the stat family).
    "season_box_scores": Endpoint(
        "playergamelogs", "PlayerGameLogs",
        (("DateFrom", ""), ("DateTo", ""), ("GameSegment", ""), ("LastNGames", "0"),
         ("LeagueID", "00"), ("Location", ""), ("MeasureType", "Base"), ("Month", "0"),
         ("OpponentTeamID", "0"), ("Outcome", ""), ("PORound", "0"), ("PaceAdjust", "N"),
         ("PerMode", "Totals"), ("Period", "0"), ("PlusMinus", "N"), ("Rank", "N"),
         ("SeasonSegment", ""), ("ShotClockRange", ""), ("VsConference", ""),
         ("VsDivision", "")),
    ),
}


def shot_chart_params(
    player_id: int,
    team_id: int | str,
    context: str = "FGA",
    game_id: str = "",
    season: str | None = None,
    season_type: str = "Regular Season",
    league_id: str = "00",
) -> dict[str, str]:
    """Parameter set for the player+team-scoped shot/foul chart
    (reference api/smart.py:481-546 ``get_shot_chart_detail_data``):
    FGA context = shot chart, PF = foul chart; player and team ids are
    required (the reference raises on both)."""
    if player_id is None:
        raise ValueError("Must provide a Player Id")
    if team_id is None:
        raise ValueError("Must provide a Team Id")
    team_id = resolve_team_id(team_id)
    if context not in ("FGA", "PF"):
        raise ValueError("context must be FGA (shots) or PF (fouls)")
    if season is None:
        from ..functions.gameid import current_season

        season = current_season()
    name = "shot_chart_detail" if context == "FGA" else "foul_chart_detail"
    return ENDPOINTS[name].params(
        LeagueID=league_id,
        Season=season,
        SeasonType=season_type,
        TeamID=str(team_id),
        PlayerID=str(player_id),
        GameID=game_id,
        ContextMeasure=context,
    )


def season_box_score_params(
    season: str, season_type: str, measure_type: str = "Base"
) -> dict[str, str]:
    """Full parameter set for the season box-score composite —
    get_season_traditional_box_score uses measure_type='Base',
    get_season_advanced_box_score 'Advanced' (api/smart.py:358-363)."""
    if measure_type not in MEASURE_TYPES:
        raise ValueError(f"measure_type must be one of {MEASURE_TYPES}")
    return ENDPOINTS["season_box_scores"].params(
        Season=season, SeasonType=season_type, MeasureType=measure_type
    )

Fetcher = Callable[[str, dict[str, str]], str]


def http_fetcher(
    timeout: float = 10.0, retries: int = 10, rate_limit_s: float = 0.01
) -> Fetcher:
    """HTTP fetcher with the reference's retry contract, iterative +
    jittered backoff instead of bare recursion. Gated behind an
    import-try: environments without ``requests`` use fixture fetchers.

    The optional per-call ``timeout`` keyword lets ``fetch_many`` apply
    an endpoint's own default (``Endpoint.timeout`` — 45 s for
    leagueseasonmatchups, mirroring api/smart.py:478) without building
    a fetcher per endpoint; the constructor argument stays the
    fallback."""
    try:
        import requests  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("requests not available; inject a fixture fetcher") from exc

    def fetch(path: str, params: dict[str, str], timeout: float = timeout) -> str:
        import requests

        last_err: Exception | None = None
        for attempt in range(retries):
            try:
                time.sleep(rate_limit_s * (1 + attempt))
                resp = requests.get(
                    f"{BASE_URL}/{path}", params=params,
                    headers=DEFAULT_HEADERS, timeout=timeout,
                )
                resp.raise_for_status()
                return resp.text
            except Exception as exc:  # noqa: BLE001
                last_err = exc
        raise RuntimeError(f"{path} failed after {retries} attempts") from last_err

    return fetch


def fixture_fetcher(responses: dict[str, str]) -> Fetcher:
    """Deterministic fetcher for tests: key = 'path?GameID=...'-style
    or bare path."""

    def fetch(path: str, params: dict[str, str]) -> str:
        for key in (f"{path}?{json.dumps(params, sort_keys=True)}", path):
            if key in responses:
                return responses[key]
        raise KeyError(f"no fixture for {path} with {params}")

    return fetch


def fetch_many(
    game_ids: DataFrame,
    endpoint_name: str,
    fetcher: Fetcher,
    id_param: str = "GameID",
    id_col: str = "GAME_ID",
    **params: str,
) -> DataFrame:
    """Distributed per-game fetch: one API call per game id, executed
    inside ``mapInPandas`` partitions (executor-side, task-parallel,
    per-task retry via the fetcher). Output: (GAME_ID, payload) ready
    for ``sources.resultset.decode_result_sets``.

    If the fetcher accepts a ``timeout`` keyword (``http_fetcher``
    does), the endpoint's own default is applied — so the slow
    leagueseasonmatchups endpoint gets its 45 s budget (reference
    api/smart.py:478) without per-call plumbing. Fixture fetchers
    without the keyword are called unchanged."""
    import inspect

    ep = ENDPOINTS[endpoint_name]
    takes_timeout = "timeout" in inspect.signature(fetcher).parameters

    def _call(path: str, p: dict[str, str]) -> str:
        if takes_timeout:
            return fetcher(path, p, timeout=ep.timeout)
        return fetcher(path, p)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _call(ep.path, ep.params(**{id_param: gid}, **params))
                for gid in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return game_ids.select(id_col).repartition(32, id_col).mapInPandas(
        kernel, schema=f"{id_col} string, payload string"
    )
