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


def test_kll_quantile_sketch_merge(spark):
    """Daily KLL sketches merged across days must estimate quantiles
    within rank-error of the exact distribution, and merging must
    equal sketching the union directly (mergeability)."""
    import random

    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.sketches import (
        merge_quantiles,
        quantile_rank,
        sketch_quantiles,
    )

    rng = random.Random(3)
    rows = [(f"d{i % 5}", rng.gauss(100.0, 15.0)) for i in range(5000)]
    df = spark.createDataFrame(rows, "day string, v double")
    daily = sketch_quantiles(df, ["day"], "v")
    assert daily.count() == 5
    overall = merge_quantiles(daily, [], [0.5, 0.9])
    row = overall.collect()[0]
    # gaussian(100, 15): p50 ~ 100, p90 ~ 119.2; rank error ~1% at
    # k=200 maps to ~±1 value unit around the median here
    assert abs(row.q50 - 100.0) < 3.0
    assert abs(row.q90 - 119.2) < 4.0
    # rank gate: exact median must sit within 3% rank of 0.5
    merged = daily.groupBy().agg(F.kll_merge_agg_double("qsketch").alias("_m"))
    exact_p50 = df.agg(F.percentile("v", F.lit(0.5)).alias("p")).collect()[0].p
    rank = merged.select(
        quantile_rank(F.col("_m"), F.lit(exact_p50)).alias("r")
    ).collect()[0].r
    assert abs(rank - 0.5) <= 0.03


def test_theta_sketch_set_ops(spark):
    """Theta sketches must answer union, intersection, AND difference
    distinct counts from per-segment sketch rows (ops HLL cannot do)."""
    import pytest

    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.sketches import (
        sketch_theta,
        theta_difference_estimate,
        theta_set_estimate,
    )

    # segment A: users 0..599; segment B: users 400..999 -> overlap 200
    rows = [("A", u) for u in range(600)] + [("B", u) for u in range(400, 1000)]
    df = spark.createDataFrame(rows, "seg string, user long")
    sk = sketch_theta(df, ["seg"], "user")
    union = theta_set_estimate(sk, [], "union").collect()[0].approx_distinct
    inter = theta_set_estimate(sk, [], "intersection").collect()[0].approx_distinct
    assert abs(union - 1000) / 1000 < 0.05
    assert abs(inter - 200) / 200 < 0.05
    with pytest.raises(ValueError, match="op must be"):
        theta_set_estimate(sk, [], "difference_typo")
    # rollup to the original grouping is the identity
    per_seg = theta_set_estimate(sk, ["seg"], "union")
    got = {r.seg: r.approx_distinct for r in per_seg.collect()}
    assert abs(got["A"] - 600) / 600 < 0.05 and abs(got["B"] - 600) / 600 < 0.05
    # difference: A \ B = users 0..399
    wide = (
        sk.groupBy()
        .pivot("seg", ["A", "B"])
        .agg(F.first("tsketch"))
        .select(theta_difference_estimate("A", "B").alias("d"))
    )
    diff = wide.collect()[0].d
    assert abs(diff - 400) / 400 < 0.05


def test_heavy_hitters_exact_and_pruned(spark):
    from nba_data_pipeline_spark.operators.sketches import heavy_hitters

    rows = [("a", "x")] * 50 + [("a", "y")] * 45 + [("a", "z")] * 5 + [("b", "x")] * 10
    df = spark.createDataFrame(rows, "g string, v string")
    out = {(r.g, r.v): (r.n, r.share_e6) for r in heavy_hitters(
        df, ["g"], "v", min_share=0.10).collect()}
    assert out[("a", "x")] == (50, 500000)
    assert out[("a", "y")] == (45, 450000)
    assert ("a", "z") not in out  # 5% < 10%
    assert out[("b", "x")] == (10, 1000000)


def test_sketch_frequencies_mergeable_and_bounded(spark):
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.sketches import sketch_frequencies

    rows = [("d1", f"t{i % 7}") for i in range(200)] + [("d2", f"t{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "day string, v string")
    per_day = sketch_frequencies(df, ["day"], "v", eps=0.01)
    # merge the per-day sketches into one via the JVM mergeInPlace —
    # the persisted-table rollup path
    jvm = spark.sparkContext._jvm
    CMS = jvm.org.apache.spark.util.sketch.CountMinSketch
    sketches = [CMS.readFrom(bytes(r["cms"])) for r in per_day.collect()]
    merged = sketches[0]
    for s in sketches[1:]:
        merged.mergeInPlace(s)
    exact = {r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    n_total = 300
    for v, n in exact.items():
        est = merged.estimateCount(v)
        assert n <= est <= n + int(0.01 * n_total) + 1, (v, n, est)
