from nba_data_pipeline_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    split_assign,
    stratified_sample,
)


def _ids(spark, n=5000):
    return spark.range(n).withColumnRenamed("id", "row_id")


def test_split_fractions_and_stability(spark):
    df = _ids(spark)
    out = split_assign(df, "row_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert None not in counts  # fractions sum to 1 -> no holdout
    # stable across invocations
    a = {r.row_id: r.split for r in out.collect()}
    b = {
        r.row_id: r.split
        for r in split_assign(df, "row_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert a == b


def test_splits_are_disjoint_and_sample_is_subset(spark):
    df = _ids(spark)
    sampled = {r.row_id for r in deterministic_sample(df, "row_id", 0.1).collect()}
    assert abs(len(sampled) / 5000 - 0.1) < 0.02
    # sampling at 0.2 strictly extends the 0.1 sample (nested samples)
    bigger = {r.row_id for r in deterministic_sample(df, "row_id", 0.2).collect()}
    assert sampled <= bigger


def test_stratified_sample(spark):
    df = _ids(spark).withColumn(
        "lang", (hash_bucket("row_id", 2)).cast("string")
    )
    out = stratified_sample(df, "row_id", "lang", {"0": 1.0, "1": 0.1})
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    full = {r.lang: r["count"] for r in df.groupBy("lang").count().collect()}
    assert counts["0"] == full["0"]  # stratum kept whole
    assert abs(counts["1"] / full["1"] - 0.1) < 0.05
