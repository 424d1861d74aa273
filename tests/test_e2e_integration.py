"""End-to-end: wire-format payloads -> distributed fetch/decode ->
shaping pipelines -> partitioned upsert -> delta-mode incremental
re-run -> derived lineup analytics. The Spark re-expression of the
reference's full CLI flow (SURVEY.md §3), as one composed test."""

import json

from pyspark.sql import functions as F, types as T

from nba_data_pipeline_spark.operators.incremental import assert_unique_key
from nba_data_pipeline_spark.plans import nba_pipelines as P
from nba_data_pipeline_spark.sinks.writer import read_table, upsert_table
from nba_data_pipeline_spark.sources.nba_api import ENDPOINTS, fetch_many, fixture_fetcher
from nba_data_pipeline_spark.sources.resultset import (
    decode_result_sets,
    result_set_df,
    result_sets_to_payload,
)
from tests.conftest import GAME_ID, PBP_ROWS

PBP_HEADERS = [
    "GAME_ID", "EVENTNUM", "EVENTMSGTYPE", "EVENTMSGACTIONTYPE", "PERIOD",
    "PCTIMESTRING", "PLAYER1_ID", "PLAYER1_TEAM_ID", "PLAYER2_ID", "PLAYER2_TEAM_ID",
]

PBP_SCHEMA = T.StructType(
    [
        T.StructField("GAME_ID", T.StringType()),
        T.StructField("EVENTNUM", T.LongType()),
        T.StructField("EVENTMSGTYPE", T.LongType()),
        T.StructField("EVENTMSGACTIONTYPE", T.LongType()),
        T.StructField("PERIOD", T.LongType()),
        T.StructField("PCTIMESTRING", T.StringType()),
        T.StructField("PLAYER1_ID", T.LongType()),
        T.StructField("PLAYER1_TEAM_ID", T.LongType()),
        T.StructField("PLAYER2_ID", T.LongType()),
        T.StructField("PLAYER2_TEAM_ID", T.LongType()),
    ]
)


def _payload():
    rows = [[r[h] for h in PBP_HEADERS] for r in PBP_ROWS]
    return result_sets_to_payload({"PlayByPlay": (PBP_HEADERS, rows)})


def test_full_flow(spark, tmp_path, rotations_df, team_game_log_df):
    # 1) ingest: per-game distributed fetch of wire payloads, decode, type
    fetcher = fixture_fetcher({ENDPOINTS["play_by_play"].path: _payload()})
    games = spark.createDataFrame([(GAME_ID,)], "GAME_ID string")
    payloads = fetch_many(games, "play_by_play", fetcher)
    raw_pbp = result_set_df(decode_result_sets(payloads.select("GAME_ID", "payload")),
                            "PlayByPlay", PBP_SCHEMA)
    assert raw_pbp.count() == len(PBP_ROWS)

    # 2) shape: play_by_play pipeline (season decode from GAME_ID, id, dedup)
    pbp = P.play_by_play(raw_pbp)
    assert_unique_key(pbp, "id")

    # 3) persist: partitioned upsert; re-run is idempotent
    path = str(tmp_path / "play_by_play")
    upsert_table(spark, pbp, path, "id", partition_by=["SEASON", "SEASON_TYPE"])
    upsert_table(spark, pbp, path, "id", partition_by=["SEASON", "SEASON_TYPE"])
    stored = read_table(spark, path)
    assert stored.count() == len(PBP_ROWS)

    # 4) incremental: delta mode prunes the already-ingested game
    tgl = P.team_game_log(team_game_log_df, "2024-25", "Regular Season")
    todo = P.incremental_game_ids(tgl, stored, "2024-25", "Regular Season")
    assert todo.count() == 0

    # 5) derive: lineups from stored pbp + rotations
    derived = P.play_by_play_with_players(
        stored.select(*[f.name for f in PBP_SCHEMA.fields], "SEASON", "SEASON_TYPE"),
        rotations_df,
        team_game_log_df,
    )
    row = derived.filter(F.col("EVENTNUM") == 100).collect()[0]
    assert [row[f"TEAM1_PLAYER{i}"] for i in range(1, 6)] == [103, 104, 105, 106, 107]
    assert_unique_key(derived, "id")
