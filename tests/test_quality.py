import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.quality import assert_valid, validate


def test_validate_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 7.0, "X"), (4, None, "F")],
        "id long, price double, status string",
    )
    out = validate(
        df,
        {
            "positive_price": F.col("price") > 0,        # rows 2 and 4 (NULL) fail
            "status_in_set": F.col("status").isin("O", "F"),
            "id_not_null": F.col("id").isNotNull(),
        },
    )
    got = {r.check_name: (r.n_violations, r.n_rows, r.passed) for r in out.collect()}
    assert got == {
        "positive_price": (2, 4, False),  # NULL price counts as a violation
        "status_in_set": (1, 4, False),
        "id_not_null": (0, 4, True),
    }


def test_validate_is_one_scan(spark, tmp_path):
    path = str(tmp_path / "scan_probe")
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    ).write.parquet(path)
    out = validate(
        spark.read.parquet(path),
        {"a": F.col("v") >= 0, "b": F.col("id") < 100, "c": F.col("id").isNotNull()},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # all checks fold into one aggregate over EXACTLY one scan — the
    # union-per-check shape would scan once per check
    assert plan.count("Scan parquet") == 1


def test_assert_valid_raises_with_names(spark):
    df = spark.createDataFrame([(1, -1.0)], "id long, v double")
    assert_valid(df, {"ok": F.col("id") > 0})  # passes silently
    with pytest.raises(ValueError, match="neg_check"):
        assert_valid(df, {"neg_check": F.col("v") > 0})


def test_validate_requires_checks(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        validate(df, {})


def test_validate_empty_input_vacuously_passes(spark):
    """Zero rows satisfy every expectation (ADVICE r2): an empty delta
    re-run must report 0 violations / passed=true, not NULLs that
    assert_valid misreads as failures."""
    df = spark.createDataFrame([], "id long, v long").filter(F.col("id") > 0)
    out = {r.check_name: r for r in validate(
        df, {"pos": F.col("v") > 0, "id_set": F.col("id").isNotNull()}
    ).collect()}
    assert all(r.passed for r in out.values())
    assert all(r.n_violations == 0 and r.n_rows == 0 for r in out.values())
    assert_valid(df, {"pos": F.col("v") > 0})  # no raise


def test_outlier_flags_z_and_iqr(spark):
    from nba_data_pipeline_spark.operators.quality import outlier_flags

    vals = [10.0] * 20 + [11.0] * 20 + [1000.0]  # one extreme point
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    rows += [(100, "b", 5.0)]  # singleton group: sd = 0 -> no z flag, no crash
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = {r.id: r for r in outlier_flags(df, ["grp"], "v").collect()}
    assert out[40].is_z_outlier and out[40].is_iqr_outlier
    assert not out[0].is_z_outlier and not out[0].is_iqr_outlier
    assert not out[100].is_z_outlier and not out[100].is_iqr_outlier
    assert out[100].z_score is None  # sd == 0 -> try_divide NULL, not an error


def test_histogram_buckets_and_overflow(spark):
    from nba_data_pipeline_spark.operators.quality import histogram

    rows = [("a", -1.0), ("a", 0.0), ("a", 9.99), ("a", 10.0), ("a", 99.9), ("a", 100.0), ("a", 250.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {(r.grp, r.bucket): r.n for r in histogram(df, ["grp"], "v", 0.0, 100.0, 10).collect()}
    assert out == {("a", 0): 1, ("a", 1): 2, ("a", 2): 1, ("a", 10): 1, ("a", 11): 2}


def test_profile_table_one_row_per_column(spark):
    from nba_data_pipeline_spark.operators.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.5)],
        "k long, s string, v double",
    )
    prof = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    assert set(prof) == {"k", "s", "v"}
    assert prof["k"].n_rows == 3 and prof["k"].n_nulls == 0 and prof["k"].n_distinct == 2
    assert prof["k"].min_value == "1" and prof["k"].max_value == "2"
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["v"].min_value == "5.0" and prof["v"].max_value == "7.5"
    # numeric min/max must be numeric, not lexicographic
    big = spark.createDataFrame([(9,), (14999,)], "x long")
    p = profile_table(big, exact_distinct=True).collect()[0]
    assert p.max_value == "14999" and p.min_value == "9"
    # approx mode returns plausible counts without the expand
    ap = {r.column: r.n_distinct for r in profile_table(df).collect()}
    assert all(v >= 1 for v in ap.values())


def test_winsorize_clips_to_group_quantiles(spark):
    import pytest as _p

    from nba_data_pipeline_spark.operators.quality import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 500.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize(df, ["grp"], "v", 0.01, 0.99)
    a = [r.v_winsorized for r in out.filter("grp = 'a'").collect()]
    assert min(a) >= 1.9 and max(a) <= 99.2  # p01/p99 of 1..100 interpolated
    assert sorted(a)[50] == 51.0             # interior values untouched
    b = sorted(r.v_winsorized for r in out.filter("grp = 'b'").collect())
    assert b[0] >= 5.0 and b[1] <= 500.0     # two-point group well-defined
    with _p.raises(ValueError):
        winsorize(df, ["grp"], "v", 0.9, 0.1)


def test_profile_drift_flags_tampered_columns(spark):
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.quality import profile_drift

    old = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 50).alias("cat"), F.lit("x").alias("s")
    )
    new = old.select(
        "id",
        F.when(F.col("id") % 2 == 0, F.lit(None).cast("long")).otherwise(F.col("cat")).alias("cat"),
        F.lit("x").alias("s"),
    )
    out = {r.column: r for r in profile_drift(old, new, exact_distinct=True).collect()}
    assert out["cat"].null_rate_drift and out["cat"].drifted
    assert not out["id"].drifted and not out["s"].drifted


def test_normalize_features_three_methods(spark):
    import pytest as _p

    from nba_data_pipeline_spark.operators.quality import normalize_features

    rows = [("a", 0.0), ("a", 5.0), ("a", 10.0), ("b", 7.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    mm = sorted(r.v_norm for r in normalize_features(df, ["grp"], "v", "minmax").filter("grp='a'").collect())
    assert mm == [0.0, 0.5, 1.0]
    z = {r.v: r.v_norm for r in normalize_features(df, ["grp"], "v", "zscore").filter("grp='a'").collect()}
    assert abs(z[5.0]) < 1e-12 and z[0.0] < 0 < z[10.0]
    # constant group: NULL, not an ANSI divide-by-zero error
    const = normalize_features(df, ["grp"], "v", "zscore").filter("grp='b'").collect()
    assert all(r.v_norm is None for r in const)
    const_mm = normalize_features(df, ["grp"], "v", "minmax").filter("grp='b'").collect()
    assert all(r.v_norm is None for r in const_mm)
    rk = sorted(r.v_norm for r in normalize_features(df, ["grp"], "v", "rank").filter("grp='a'").collect())
    assert rk == [0.0, 0.5, 1.0]
    with _p.raises(ValueError, match="unknown method"):
        normalize_features(df, ["grp"], "v", "log")
