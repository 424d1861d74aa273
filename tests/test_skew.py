from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.skew import add_salt, salted_join, salted_sum_count


def _skewed(spark, n=2000):
    # 90% of rows share one hot key
    rows = [(i, "hot" if i % 10 != 0 else f"cold{i % 7}", float(i % 100)) for i in range(n)]
    return spark.createDataFrame(rows, "row_id long, k string, v double")


def test_salted_sum_count_equals_plain_agg(spark):
    df = _skewed(spark)
    salted = {
        (r.k,): (round(r.total, 6), r.n)
        for r in salted_sum_count(df, ["k"], "v", "row_id", buckets=16).collect()
    }
    plain = {
        (r.k,): (round(r.total, 6), r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.0), ("cold0", 2.0), ("missing", 9.9)], "k string, w double"
    )
    salted = salted_join(big, small, "k", "row_id", buckets=8)
    plain = big.join(small, "k")
    assert salted.count() == plain.count()
    s = {(r.row_id, r.w) for r in salted.collect()}
    p = {(r.row_id, r.w) for r in plain.collect()}
    assert s == p


def test_salt_is_deterministic(spark):
    df = _skewed(spark, 100)
    a = {r.row_id: r._salt for r in add_salt(df, "row_id", 8).collect()}
    b = {r.row_id: r._salt for r in add_salt(df, "row_id", 8).collect()}
    assert a == b and set(a.values()) <= set(range(8))
