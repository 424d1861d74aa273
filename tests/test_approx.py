from pyspark.sql import functions as F

from nba_data_pipeline_spark.core.data import load_table

SF = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_tolerance(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_percentile_approx_close_to_exact(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02
