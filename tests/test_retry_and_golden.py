import glob

import pytest

from nba_data_pipeline_spark.sinks.writer import write_csv_golden
from nba_data_pipeline_spark.sources.nba_api import ENDPOINTS, fixture_fetcher


def test_csv_golden_single_file(spark, tmp_path):
    df = spark.createDataFrame(
        [("0022400236", 1610612766, 0.0, 2900.0)],
        "GAME_ID string, TEAM_ID long, IN_TIME_REAL double, OUT_TIME_REAL double",
    )
    path = str(tmp_path / "golden")
    write_csv_golden(df, path)
    parts = glob.glob(f"{path}/part-*.csv")
    assert len(parts) == 1  # coalesced to one diffable file
    lines = open(parts[0]).read().strip().splitlines()
    assert lines[0] == "GAME_ID,TEAM_ID,IN_TIME_REAL,OUT_TIME_REAL"
    assert lines[1].startswith("0022400236,1610612766,")


def test_fixture_fetcher_missing_key_raises():
    fetch = fixture_fetcher({"playbyplayv2": "{}"})
    assert fetch("playbyplayv2", {"GameID": "x"}) == "{}"
    with pytest.raises(KeyError, match="no fixture"):
        fetch("boxscoretraditionalv2", {})


def test_flaky_fetcher_retried_by_caller():
    """The retry contract: a fetcher that fails transiently succeeds
    within the retry budget (modelled caller-side like http_fetcher)."""
    calls = {"n": 0}

    def flaky(path, params):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return '{"resultSets": []}'

    # same loop shape as sources.nba_api.http_fetcher
    last = None
    for _ in range(10):
        try:
            out = flaky("x", {})
            break
        except Exception as exc:  # noqa: BLE001
            last = exc
    else:
        raise AssertionError(f"retries exhausted: {last}")
    assert out == '{"resultSets": []}' and calls["n"] == 3


def test_endpoint_param_defaults():
    ep = ENDPOINTS["play_by_play"]
    params = ep.params(GameID="0022400001")
    assert params["StartPeriod"] == "0" and params["GameID"] == "0022400001"
