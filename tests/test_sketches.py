from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.sketches import (
    estimate,
    merge_distinct,
    sketch_distinct,
)


def test_sketch_merge_equals_whole(spark):
    """Sketching two halves and merging must estimate the union, not
    the sum — the mergeability property that makes sketch tables work."""
    df = spark.range(2000).select(
        (F.col("id") % 2).alias("half"), (F.col("id") % 700).alias("v")
    )
    # halves overlap heavily: union distinct = 700, sum of halves = 1400
    halves = sketch_distinct(df, ["half"], "v")
    total = merge_distinct(halves, []).collect()[0].approx_distinct
    assert abs(total - 700) / 700 < 0.05
    # 700 is even, so even ids hit exactly the 350 even residues and
    # odd ids the 350 odd ones — disjoint halves whose union is 700
    per_half = merge_distinct(halves, ["half"]).collect()
    for r in per_half:
        assert abs(r.approx_distinct - 350) / 350 < 0.05


def test_sketch_table_persists(spark, tmp_path):
    df = spark.range(5000).select((F.col("id") % 10).alias("g"), F.col("id").alias("v"))
    path = str(tmp_path / "sk")
    sketch_distinct(df, ["g"], "v").write.parquet(path)
    back = spark.read.parquet(path)
    out = merge_distinct(back, []).collect()[0].approx_distinct
    assert abs(out - 5000) / 5000 < 0.05
    one = back.limit(1).select(estimate("sketch").alias("e")).collect()[0].e
    assert abs(one - 500) / 500 < 0.05
