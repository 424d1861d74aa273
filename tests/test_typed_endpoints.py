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
