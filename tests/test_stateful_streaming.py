import datetime as dt

from pyspark.sql import functions as F, types as T

from nba_data_pipeline_spark.streaming.stateful import stream_running_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.5),
        (1, t0 + dt.timedelta(minutes=1), 2.5),
        (2, t0, 10.0),
        (2, t0 + dt.timedelta(minutes=2), 0.5),
        (2, t0 + dt.timedelta(minutes=3), 0.5),
    ]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(src)

    out = stream_running_totals(
        spark, src, SCHEMA, "user_id", "value", query_name="rt_test"
    )
    # last update per key is the final running state
    final = {
        r.key: (r.total, r.n)
        for r in out.orderBy("n").collect()  # increasing n -> last wins per key
    }
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 6).alias("total"), F.count("*").alias("n"))
    )
    expected = {r.user_id: (r.total, r.n) for r in batch.collect()}
    assert final == expected


def test_stateful_heavy_hitters_bounds_and_planted_hitter(spark, tmp_path):
    """Misra-Gries over 3 micro-batches (one file each): the planted
    heavy token must survive with its count within the
    n_seen/(capacity+1) lower-bound error; no reported count may
    exceed the true count; state stays bounded at capacity."""
    import random

    from nba_data_pipeline_spark.streaming.stateful import stream_heavy_hitters

    rng = random.Random(7)
    schema = T.StructType(
        [T.StructField("lang", T.StringType()), T.StructField("token", T.StringType())]
    )
    src = str(tmp_path / "hh_src")
    capacity = 10
    true = {}
    for batch in range(3):
        rows = []
        for _ in range(400):
            # ~25% planted heavy token, rest spread over 200 tail tokens
            tok = "HEAVY" if rng.random() < 0.25 else f"t{rng.randint(0, 199)}"
            rows.append(("en", tok))
            true[tok] = true.get(tok, 0) + 1
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = stream_heavy_hitters(
        spark, src, schema, "lang", "token", capacity=capacity,
        query_name="hh_test", max_files_per_trigger=1,
    )
    # update-mode memory sink: take the rows of the LAST emission (max n_seen)
    rows = out.collect()
    n_final = max(r.n_seen for r in rows)
    # token-NULL rows are empty-summary markers, not counts
    final = {
        r.token: r.count_lb
        for r in rows
        if r.n_seen == n_final and r.token is not None
    }
    assert n_final == sum(true.values())
    assert len(final) <= capacity
    eps = n_final / (capacity + 1)
    # lower bound: never overcounts; heavy token present and within eps
    for tok, lb in final.items():
        assert lb <= true[tok], (tok, lb, true[tok])
    assert "HEAVY" in final
    assert final["HEAVY"] >= true["HEAVY"] - eps
    # every token with true count > eps must be present (MG guarantee)
    for tok, c in true.items():
        if c > eps:
            assert tok in final, (tok, c, eps)


def test_stateful_heavy_hitters_flat_distribution_emits_markers(spark, tmp_path):
    """Adversarially FLAT data (every token distinct): the MG summary
    legitimately empties (every count <= n/(capacity+1)), but each
    batch must still land a marker row so the final n_seen is
    observable at the sink — the staleness bug a planted-heavy corpus
    never triggers."""
    from nba_data_pipeline_spark.streaming.stateful import stream_heavy_hitters

    schema = T.StructType(
        [T.StructField("lang", T.StringType()), T.StructField("token", T.StringType())]
    )
    src = str(tmp_path / "flat_src")
    total = 0
    for batch in range(3):
        rows = [("en", f"uniq_{batch}_{i}") for i in range(50)]
        total += len(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    out = stream_heavy_hitters(
        spark, src, schema, "lang", "token", capacity=5,
        query_name="hh_flat_test", max_files_per_trigger=1,
    )
    rows = out.collect()
    # every batch observable: cumulative n_seen 50, 100, 150 all present
    assert {r.n_seen for r in rows} == {50, 100, 150}
    assert max(r.n_seen for r in rows) == total
    # markers are token-NULL with zero count
    for r in rows:
        if r.token is None:
            assert r.count_lb == 0
