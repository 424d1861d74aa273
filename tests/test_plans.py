"""Physical-plan assertions: the scale properties the engine promises
(predicate pushdown, column pruning, broadcast joins, partial
aggregation) locked in as tests so plan regressions are caught, not
just slow."""

import io
import contextlib

from pyspark.sql import functions as F

from nba_data_pipeline_spark import harness


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


SF = "/root/testdata/sf0.01"


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = _plan(harness.queries()["tpch_q1"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    assert "l_comment" not in plan
    assert "ReadSchema" in plan and "l_returnflag" in plan


def test_left_anti_delta_broadcasts_key_only_build_side(spark):
    plan = _plan(harness.queries()["left_anti_delta"](spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # build side scans only the key + filter column
    assert "o_totalprice" not in plan


def test_broadcast_dim_join_has_no_sort_merge(spark):
    plan = _plan(harness.queries()["broadcast_dim_join"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_group_agg_has_partial_aggregation(spark):
    plan = _plan(harness.queries()["group_agg_suite"](spark, SF))
    # map-side combine before the shuffle: partial then final agg
    assert plan.count("HashAggregate") >= 2


def test_partition_filter_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "2024-25", "Regular Season", 1.0), ("b", "2023-24", "Playoffs", 2.0)],
        "id string, SEASON string, SEASON_TYPE string, v double",
    )
    path = str(tmp_path / "t")
    df.write.partitionBy("SEASON", "SEASON_TYPE").parquet(path)
    plan = _plan(spark.read.parquet(path).filter(F.col("SEASON") == "2024-25"))
    assert "PartitionFilters" in plan and "SEASON" in plan


def test_tpch_q14_broadcasts_part_and_pushes_dates(spark):
    plan = _plan(harness.queries()["tpch_q14"](spark, SF))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_tpch_q4_is_semi_join(spark):
    plan = _plan(harness.queries()["tpch_q4"](spark, SF))
    assert "LeftSemi" in plan


def test_chunk_text_has_no_shuffle(spark):
    """Chunking is embarrassingly parallel: the plan must contain no
    Exchange (the only shuffle is whatever the caller adds)."""
    plan = _plan(harness.queries()["chunk_text"](spark, SF))
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The eval-set gram table must broadcast; the corpus side is one
    explode + hash aggregate with map-side partials."""
    plan = _plan(harness.queries()["decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final on doc_id


def test_pack_sequences_single_shuffle(spark):
    """Packing = one hash shuffle on the shard key + one window."""
    import re

    plan = _plan(harness.queries()["pack_sequences"](spark, SF))
    # formatted explain numbers each operator once in the detail section
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" in plan


def test_repetition_metrics_no_shuffle(spark):
    plan = _plan(harness.queries()["repetition_metrics"](spark, SF))
    assert "Exchange" not in plan


def test_mixture_sample_broadcasts_cuts(spark):
    """The per-source cut table broadcasts back onto the corpus; the
    corpus scan itself is never hash-shuffled."""
    plan = _plan(harness.queries()["mixture_sample"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q17_uses_window_not_self_join(spark):
    """The correlated avg-quantity subquery must decorrelate to a
    window aggregate, not a lineitem self-join."""
    plan = _plan(harness.queries()["tpch_q17"](spark, SF))
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q22_anti_join(spark):
    plan = _plan(harness.queries()["tpch_q22"](spark, SF))
    assert "LeftAnti" in plan
