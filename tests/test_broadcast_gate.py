"""ADVICE-low closures: size-gated ANN broadcast + lazy LSH defaults."""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators import dedup, similarity
from nba_data_pipeline_spark.operators.similarity import _maybe_broadcast


def _has_broadcast_hint(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().optimizedPlan().toString() or (
        "BroadcastExchange" in df._jdf.queryExecution().executedPlan().toString()
    )


@pytest.fixture()
def tiny(spark):
    return spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_forced_true_hints(tiny):
    joined = tiny.alias("a").join(_maybe_broadcast(tiny.alias("b"), True), "id")
    assert _has_broadcast_hint(joined)


def test_forced_false_never_hints(tiny):
    out = _maybe_broadcast(tiny, False)
    assert out is tiny


def test_auto_hints_small_frame(tiny):
    joined = tiny.alias("a").join(_maybe_broadcast(tiny.alias("b"), None), "id")
    assert _has_broadcast_hint(joined)


def test_auto_skips_frame_over_cap(tiny, monkeypatch):
    monkeypatch.setattr(similarity, "_BROADCAST_CAP_BYTES", 0)
    out = _maybe_broadcast(tiny, None)
    assert "ResolvedHint" not in out._jdf.queryExecution().optimizedPlan().toString()


def test_batch_topk_auto_matches_forced(spark):
    rows = [(i, [float(i), float(10 - i), 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    queries = df.limit(3)
    auto = similarity.batch_topk(queries, df, "embedding", "vec_id", "vec_id", k=3)
    forced = similarity.batch_topk(
        queries, df, "embedding", "vec_id", "vec_id", k=3, broadcast_queries=False
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, forced.collect()))


def test_lsh_ops_lazy_by_default():
    for fn in (dedup.minhash_lsh_pairs, dedup.simhash_near_pairs, dedup._bucket_pairs):
        assert inspect.signature(fn).parameters["eager_probe"].default is False, fn


def test_minhash_lazy_plan_runs_no_job(spark, monkeypatch):
    """Plan construction with the lazy default must not trigger a
    collect (the round-3 ADVICE item: eager_probe ran an action at
    plan-build time)."""
    docs = spark.createDataFrame(
        [(i, f"some repeated text body number {i % 3} padded for shingles") for i in range(12)],
        "doc_id int, text string",
    )
    calls = []
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    orig = CDF.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(CDF, "collect", spy)
    dedup.minhash_lsh_pairs(docs, "doc_id", "text")
    assert not calls, "plan construction ran a collect() under the lazy default"
