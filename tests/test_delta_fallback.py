"""Executed everywhere: without the delta package (or on a plain
parquet path) _try_delta_merge must return False so the caller's
anti-join partition rewrite takes over — the one behavior of the Delta
branch this environment CAN pin."""

from nba_data_pipeline_spark.sinks.writer import _try_delta_merge


def test_try_delta_merge_returns_false_without_delta(spark, tmp_path):
    path = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(path)
    src = spark.createDataFrame([(2, "b")], "id long, v string")
    assert _try_delta_merge(spark, src, path, "id", update_matched=True) is False
    # and the composed upsert still works end-to-end on plain parquet
    from nba_data_pipeline_spark.sinks.writer import upsert_table

    upsert_table(spark, src, path, "id")
    assert spark.read.parquet(path).count() == 2
