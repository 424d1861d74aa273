"""Z-order clustering: Morton key correctness + physical locality."""

from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.layout import write_zordered, zorder_key


def test_zorder_key_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = [r.z for r in df.select(zorder_key("a", "b").alias("z")).collect()]
    # morton(3,5): a=011, b=101 -> b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 39
    assert got == [0, 1, 2, 39, (1 << 32) - 1]


def test_write_zordered_gives_two_dim_locality(spark, tmp_path):
    """Each output file owns a contiguous z-range, so its min-max span
    in BOTH dimensions is far smaller than the global range — that span
    is exactly what parquet row-group stats prune on."""
    n = 1 << 12
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 256).alias("a"),   # scrambled 0..255
        ((F.col("id") + 7) * 40503 % 256).alias("b"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], num_files=16)
    back = spark.read.parquet(path).withColumn("f", F.input_file_name())
    spans = back.groupBy("f").agg(
        (F.max("a") - F.min("a")).alias("sa"), (F.max("b") - F.min("b")).alias("sb")
    )
    row = spans.agg(F.avg("sa").alias("ma"), F.avg("sb").alias("mb")).collect()[0]
    # random layout would give ~255 span per file in both dims; the curve
    # must constrain both well below that
    assert row.ma < 160 and row.mb < 160
    # and no rows lost
    assert back.count() == n


def test_write_zordered_arg_contract(spark, tmp_path):
    import pytest

    df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        write_zordered(df, str(tmp_path / "x"), ["a"])
    with pytest.raises(ValueError):
        zorder_key("a", "b", bits=20)


def test_zorder_key_int32_inputs_no_sign_overflow(spark):
    """IntegerType inputs with b >= 32768 must not overflow into the
    int32 sign bit (ADVICE r2): the key is computed in 64-bit and equals
    the LongType-input key."""
    rows = [(0, 32768), (65535, 65535), (12345, 54321)]
    ints = spark.createDataFrame(rows, "a int, b int")
    longs = spark.createDataFrame(rows, "a long, b long")
    zi = [r.z for r in ints.select(zorder_key("a", "b").alias("z")).collect()]
    zl = [r.z for r in longs.select(zorder_key("a", "b").alias("z")).collect()]
    assert zi == zl
    assert all(z >= 0 for z in zi)


def test_assign_ordinals_matches_global_sort(spark):
    """Distributed zipWithIndex == the single-partition row_number
    ground truth, on a shuffled input with several range partitions."""
    import random

    from nba_data_pipeline_spark.operators.layout import assign_ordinals

    rows = [(i, f"g{i % 7}") for i in range(500)]
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame(rows, "pk long, grp string").repartition(13)
    out = assign_ordinals(df, ["grp", "pk"], num_partitions=6)
    got = {(r.grp, r.pk): r.ordinal for r in out.collect()}
    expected_order = sorted(rows, key=lambda t: (t[1], t[0]))
    for ordinal, (pk, grp) in enumerate(expected_order):
        assert got[(grp, pk)] == ordinal
    # dense 0..n-1, no gaps or dupes
    assert sorted(got.values()) == list(range(500))


def test_assign_ordinals_requires_order_cols(spark):
    import pytest

    from nba_data_pipeline_spark.operators.layout import assign_ordinals

    with pytest.raises(ValueError, match="non-empty"):
        assign_ordinals(spark.range(3), [])
