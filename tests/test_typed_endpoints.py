from nba_data_pipeline_spark.sources.endpoint_schemas import (
    GAME_ROTATION_SET,
    fetch_typed,
)
from nba_data_pipeline_spark.sources.nba_api import ENDPOINTS, fixture_fetcher
from nba_data_pipeline_spark.sources.resultset import result_sets_to_payload
from nba_data_pipeline_spark.plans.nba_pipelines import rotations


def _rotation_payload():
    headers = [f.name for f in GAME_ROTATION_SET.fields]
    home = [
        ["0022400001", 100, "City", "Alphas", 101 + i, "F", "L", 0.0, 14400.0, 5.0, 1.0, 0.2]
        for i in range(5)
    ]
    away = [
        ["0022400001", 200, "City", "Betas", 201 + i, "F", "L", 0.0, 14400.0, 4.0, -1.0, 0.2]
        for i in range(5)
    ]
    return result_sets_to_payload(
        {"HomeTeam": (headers, home), "AwayTeam": (headers, away)}
    )


def test_fetch_typed_rotation_to_pipeline(spark):
    fetcher = fixture_fetcher({ENDPOINTS["game_rotation"].path: _rotation_payload()})
    games = spark.createDataFrame([("0022400001",)], "GAME_ID string")
    home = fetch_typed(games, "game_rotation", fetcher, result_set="HomeTeam")
    away = fetch_typed(games, "game_rotation", fetcher, result_set="AwayTeam")
    raw = home.unionByName(away)
    assert raw.schema == GAME_ROTATION_SET
    assert raw.count() == 10
    # feeds the rotations pipeline directly (reference etl/rotations.py flow)
    rolled = rotations(raw, "2024-25", "Regular Season")
    assert rolled.count() == 10
    row = rolled.filter("PLAYER_ID = 101").collect()[0]
    assert [tuple(s) for s in row.STINTS] == [(0.0, 14400.0)]


def test_fetch_typed_requires_set_choice_when_ambiguous(spark):
    import pytest

    fetcher = fixture_fetcher({ENDPOINTS["game_rotation"].path: _rotation_payload()})
    games = spark.createDataFrame([("0022400001",)], "GAME_ID string")
    with pytest.raises(ValueError, match="pick one"):
        fetch_typed(games, "game_rotation", fetcher)


def test_fetch_season_box_scores_composite(spark):
    """S3 gap closure: the season-level composite (reference
    api/smart.py:358-390) — one playergamelogs call, typed decode."""
    from nba_data_pipeline_spark.sources.endpoint_schemas import (
        PLAYER_GAME_LOGS_SET,
        fetch_season_box_scores,
    )
    from nba_data_pipeline_spark.sources.nba_api import season_box_score_params
    from nba_data_pipeline_spark.sources.resultset import result_sets_to_payload

    headers = [f.name for f in PLAYER_GAME_LOGS_SET.fields]
    row = ["2024-25", 203999, "Star Player", "Star", 1610612743, "DEN", "Nuggets",
           "0022400001", "2024-10-24", "DEN vs. OKC", "W", 36.5,
           12, 20, 0.6, 2, 5, 0.4, 9, 10, 0.9, 3, 9, 12, 10, 3, 1, 1, 35, 8]
    payload = result_sets_to_payload(
        {"PlayerGameLogs": (headers, [[str(v) for v in row]])}
    )
    seen_params = {}

    def fetcher(path, params):
        seen_params.update({"path": path, **params})
        return payload

    df = fetch_season_box_scores(spark, fetcher, "2024-25", "Regular Season")
    assert df.schema == PLAYER_GAME_LOGS_SET
    got = df.collect()[0]
    assert (got.PLAYER_ID, got.PTS, got.GAME_ID) == (203999, 35.0, "0022400001")
    # the reference's exact parameterization (api/smart.py:364-388)
    assert seen_params["path"] == "playergamelogs"
    assert seen_params["Season"] == "2024-25"
    assert seen_params["SeasonType"] == "Regular Season"
    assert seen_params["MeasureType"] == "Base"
    assert seen_params["PerMode"] == "Totals"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        season_box_score_params("2024-25", "Regular Season", measure_type="Bogus")


def test_shot_chart_params_contract():
    from nba_data_pipeline_spark.sources.nba_api import shot_chart_params
    import pytest as _p

    p = shot_chart_params(203999, 1610612743, season="2024-25")
    assert p["ContextMeasure"] == "FGA" and p["PlayerID"] == "203999"
    assert p["TeamID"] == "1610612743" and p["Season"] == "2024-25"
    foul = shot_chart_params(203999, 1610612743, context="PF", season="2024-25")
    assert foul["ContextMeasure"] == "PF"
    with _p.raises(ValueError):
        shot_chart_params(None, 1)
    with _p.raises(ValueError):
        shot_chart_params(1, None)
    with _p.raises(ValueError):
        shot_chart_params(1, 2, context="AST", season="2024-25")


def test_nba_teams_match_reference_ids():
    """All 30 franchise ids equal the reference constants
    (api/smart.py:11-46 NBATeams)."""
    from nba_data_pipeline_spark.sources.nba_api import NBA_TEAMS, resolve_team_id

    expected = {
        "AtlantaHawks": 1610612737, "BostonCeltics": 1610612738,
        "BrooklynNets": 1610612751, "CharlotteHornets": 1610612766,
        "ChicagoBulls": 1610612741, "ClevelandCavaliers": 1610612739,
        "DallasMavericks": 1610612742, "DenverNuggets": 1610612743,
        "DetroitPistons": 1610612765, "GoldenStateWarriors": 1610612744,
        "HoustonRockets": 1610612745, "IndianaPacers": 1610612754,
        "LosAngelesClippers": 1610612746, "LosAngelesLakers": 1610612747,
        "MemphisGrizzlies": 1610612763, "MiamiHeat": 1610612748,
        "MilwaukeeBucks": 1610612749, "MinnesotaTimberwolves": 1610612750,
        "NewOrleansPelicans": 1610612740, "NewYorkKnicks": 1610612752,
        "OklahomaCityThunder": 1610612760, "OrlandoMagic": 1610612753,
        "Philadelphia76ers": 1610612755, "PhoenixSuns": 1610612756,
        "PortlandTrailBlazers": 1610612757, "SacramentoKings": 1610612758,
        "SanAntonioSpurs": 1610612759, "TorontoRaptors": 1610612761,
        "UtahJazz": 1610612762, "WashingtonWizards": 1610612764,
    }
    assert NBA_TEAMS == expected
    assert len({*NBA_TEAMS.values()}) == 30
    # resolution accepts ids, digit strings, and spaced/cased names
    assert resolve_team_id(1610612744) == 1610612744
    assert resolve_team_id("1610612744") == 1610612744
    assert resolve_team_id("GoldenStateWarriors") == 1610612744
    assert resolve_team_id("golden state warriors") == 1610612744
    assert resolve_team_id("Philadelphia_76ers") == 1610612755
    import pytest

    with pytest.raises(ValueError, match="unknown team"):
        resolve_team_id("Seattle SuperSonics")


def test_shot_chart_params_accepts_team_name():
    from nba_data_pipeline_spark.sources.nba_api import shot_chart_params

    p = shot_chart_params(203999, "DenverNuggets", season="2024-25")
    assert p["TeamID"] == "1610612743"


def test_endpoint_timeout_defaults_and_matchups_override():
    """Reference parity: api/smart.py:478 raises the request timeout to
    45 s for leagueseasonmatchups; every other endpoint keeps the 10 s
    default."""
    assert ENDPOINTS["defensive_matchups"].timeout == 45.0
    for name, ep in ENDPOINTS.items():
        if name != "defensive_matchups":
            assert ep.timeout == 10.0, name


def test_fetch_many_passes_endpoint_timeout_to_aware_fetcher(spark):
    """A fetcher that accepts a timeout keyword (http_fetcher's shape)
    receives the ENDPOINT's own default from fetch_many; keyword-less
    fixture fetchers keep working unchanged."""
    from nba_data_pipeline_spark.sources.nba_api import fetch_many

    # the fetcher runs inside mapInPandas on a worker, so report the
    # received timeout through the payload, not a driver-side closure
    def aware(path, params, timeout=10.0):
        return f"timeout={timeout}"

    ids = spark.createDataFrame([("0022400001",)], "GAME_ID string")
    rows = fetch_many(ids, "defensive_matchups", aware, id_param="Season").collect()
    assert rows[0].payload == "timeout=45.0"
    rows = fetch_many(ids, "play_by_play", aware).collect()
    assert rows[0].payload == "timeout=10.0"
    # keyword-less fetcher: no timeout injected, no crash
    def plain(path, params):
        return path

    rows = fetch_many(ids, "play_by_play", plain).collect()
    assert rows[0].payload == "playbyplayv2"
