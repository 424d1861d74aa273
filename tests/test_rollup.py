from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.rollup import (
    explode_stints,
    rollup_stints,
    stints_from_json,
    stints_to_json,
)


def test_rollup_orders_stints_and_round_trips(spark, rotation_raw_df):
    rolled = rollup_stints(rotation_raw_df)
    row = {(r.TEAM_ID, r.PLAYER_ID): r.STINTS for r in rolled.collect()}
    assert [tuple(s) for s in row[(200, 202)]] == [(0.0, 5000.0), (7200.0, 14400.0)]
    # explode is the exact inverse (same number of stint rows as raw)
    assert explode_stints(rolled).count() == rotation_raw_df.count()


def test_stints_json_boundary(spark, rotations_df):
    as_json = stints_to_json(rotations_df)
    assert dict(as_json.dtypes)["STINTS"] == "string"
    back = stints_from_json(as_json)
    orig = {r.PLAYER_ID: [tuple(s) for s in r.STINTS] for r in rotations_df.collect()}
    rt = {r.PLAYER_ID: [tuple(s) for s in r.STINTS] for r in back.collect()}
    assert orig == rt
