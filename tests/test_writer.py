import os

from nba_data_pipeline_spark.sinks.writer import (
    insert_ignore_table,
    read_table,
    upsert_table,
    write_table,
)


def test_partitioned_write_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("a-1", "2024-25", "Regular Season", 1.0), ("b-1", "2023-24", "Playoffs", 2.0)],
        "id string, SEASON string, SEASON_TYPE string, v double",
    )
    path = str(tmp_path / "t")
    write_table(df, path, partition_by=["SEASON", "SEASON_TYPE"])
    assert os.path.isdir(os.path.join(path, "SEASON=2024-25"))
    back = read_table(spark, path)
    assert back.count() == 2
    # partition filter prunes to one directory's worth of rows
    assert back.filter("SEASON = '2024-25'").count() == 1


def test_upsert_create_update_idempotent(spark, tmp_path):
    path = str(tmp_path / "u")
    v1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "id string, v double")
    upsert_table(spark, v1, path, "id")  # create-on-first-write
    v2 = spark.createDataFrame([("b", 20.0), ("c", 3.0)], "id string, v double")
    upsert_table(spark, v2, path, "id")
    got = {r.id: r.v for r in read_table(spark, path).collect()}
    assert got == {"a": 1.0, "b": 20.0, "c": 3.0}
    upsert_table(spark, v2, path, "id")  # idempotent re-run
    got = {r.id: r.v for r in read_table(spark, path).collect()}
    assert got == {"a": 1.0, "b": 20.0, "c": 3.0}


def test_insert_ignore_table(spark, tmp_path):
    path = str(tmp_path / "i")
    insert_ignore_table(spark, spark.createDataFrame([("a", 1.0)], "id string, v double"), path, "id")
    insert_ignore_table(
        spark, spark.createDataFrame([("a", 99.0), ("b", 2.0)], "id string, v double"), path, "id"
    )
    got = {r.id: r.v for r in read_table(spark, path).collect()}
    assert got == {"a": 1.0, "b": 2.0}
