import pytest

from nba_data_pipeline_spark.operators.incremental import (
    assert_unique_key,
    delta_filter,
    insert_ignore,
    merge_upsert,
)


def test_delta_filter_single_and_composite_keys(spark):
    work = spark.createDataFrame(
        [("g1", 1, "a"), ("g2", 1, "b"), ("g2", 2, "c")], "g string, p long, v string"
    )
    existing = spark.createDataFrame([("g1", 1), ("g9", 9)], "g string, p long")
    assert delta_filter(work, existing, ["g"]).count() == 2  # g2 rows survive
    out = delta_filter(work, existing, ["g", "p"])
    assert sorted(r.v for r in out.collect()) == ["b", "c"]


def test_merge_upsert_source_wins_and_idempotent(spark):
    target = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "id string, v double")
    source = spark.createDataFrame([("b", 20.0), ("c", 3.0)], "id string, v double")
    merged = merge_upsert(target, source, "id")
    assert {r.id: r.v for r in merged.collect()} == {"a": 1.0, "b": 20.0, "c": 3.0}
    again = merge_upsert(merged, source, "id")
    assert {r.id: r.v for r in again.collect()} == {"a": 1.0, "b": 20.0, "c": 3.0}


def test_insert_ignore_keeps_target(spark):
    target = spark.createDataFrame([("a", 1.0)], "id string, v double")
    source = spark.createDataFrame([("a", 99.0), ("b", 2.0)], "id string, v double")
    out = insert_ignore(target, source, "id")
    assert {r.id: r.v for r in out.collect()} == {"a": 1.0, "b": 2.0}


def test_assert_unique_key(spark):
    ok = spark.createDataFrame([("a",), ("b",)], "id string")
    assert_unique_key(ok, "id")
    bad = spark.createDataFrame([("a",), ("a",)], "id string")
    with pytest.raises(ValueError, match="duplicate key"):
        assert_unique_key(bad, "id")


def test_table_diff_classifies_all_four_states(spark):
    from nba_data_pipeline_spark.operators.incremental import table_diff, table_diff_summary

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged
         (2, "B", 2.0),        # changed
         (3, "c", None),       # unchanged, incl. NULL-safe compare
         (5, "e", 5.0)],       # added; 4 removed
        "k long, s string, v double",
    )
    out = {r.k: r.diff_status for r in table_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "unchanged", 4: "removed", 5: "added"}
    summary = {r.diff_status: r.n for r in table_diff_summary(old, new, ["k"]).collect()}
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}
    # compare_cols restriction: v-only diff sees key 2 as unchanged
    out2 = {r.k: r.diff_status for r in table_diff(old, new, ["k"], ["v"]).collect()}
    assert out2[2] == "unchanged"
    # NULL vs value flips to changed (NULL marker is not a real value)
    new2 = spark.createDataFrame([(3, "c", 9.0)], "k long, s string, v double")
    assert {r.k: r.diff_status for r in table_diff(old.filter("k=3"), new2, ["k"]).collect()} == {3: "changed"}
