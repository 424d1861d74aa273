"""ADVICE-low closures: size-gated ANN broadcast + lazy LSH defaults."""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.core import session as core_session
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
    monkeypatch.setattr(core_session, "AUTO_BROADCAST_BYTES", 0)
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


def test_fanout_scales_auto_gate(tiny, monkeypatch):
    """ADVICE-medium closure: Catalyst does not scale Generate (explode)
    row fan-out in its stats, so the auto gate must multiply the
    pre-explode estimate by the known probe fan-out. With a cap just
    above the tiny frame's own estimate, fanout=1 broadcasts and a
    large fanout must not."""
    est = int(
        str(tiny._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    monkeypatch.setattr(core_session, "AUTO_BROADCAST_BYTES", est * 10)
    hinted = tiny.alias("a").join(
        _maybe_broadcast(tiny.alias("b"), None, estimate_from=tiny, fanout=1), "id"
    )
    assert "strategy=broadcast" in hinted._jdf.queryExecution().optimizedPlan().toString()
    skipped = tiny.alias("a").join(
        _maybe_broadcast(tiny.alias("b"), None, estimate_from=tiny, fanout=100), "id"
    )
    assert "strategy=broadcast" not in skipped._jdf.queryExecution().optimizedPlan().toString()


def test_lsh_batch_topk_gates_on_probe_fanout(spark, monkeypatch):
    """lsh_batch_topk at multiprobe_bits=2 explodes each query into
    1 + n + C(n,2) probe rows; a cap sized between the query frame and
    the exploded frame must NOT broadcast the probe side."""
    rows = [(i, [float(i % 7), float(i % 5), 1.0, -1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    queries = df.limit(4)
    qb_est = int(
        str(
            queries.select("vec_id", "embedding")
            ._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    )
    # 79x fan-out at n_planes=12/bits=2: cap at 4x the query estimate
    monkeypatch.setattr(core_session, "AUTO_BROADCAST_BYTES", qb_est * 4)
    out = similarity.lsh_batch_topk(
        queries, df, "embedding", "vec_id", "vec_id",
        dim=4, k=3, n_planes=12, multiprobe_bits=2,
    )
    assert "strategy=broadcast" not in out._jdf.queryExecution().optimizedPlan().toString()
    # and the result still matches the unhinted plan
    forced = similarity.lsh_batch_topk(
        queries, df, "embedding", "vec_id", "vec_id",
        dim=4, k=3, n_planes=12, multiprobe_bits=2, broadcast_queries=False,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, forced.collect()))


def test_rerank_topk_rejects_empty_and_colliding_features(spark):
    cand = spark.createDataFrame(
        [(1, 10, 0.5)], "qid int, cid int, f1 double"
    )
    with pytest.raises(ValueError, match="non-empty"):
        similarity.rerank_topk(cand, "qid", "cid", features=[])
    with pytest.raises(ValueError, match="collide"):
        similarity.rerank_topk(
            cand.withColumnRenamed("f1", "query_id"),
            "qid", "cid", features=[("query_id", 1.0)],
        )


def test_merge_quantiles_name_precision(spark):
    from nba_data_pipeline_spark.operators.sketches import (
        merge_quantiles,
        sketch_quantiles,
    )

    df = spark.range(1000).select(
        (F.col("id") % 4).alias("g"), F.col("id").cast("double").alias("v")
    )
    daily = sketch_quantiles(df, ["g"], "v")
    out = merge_quantiles(daily, [], [0.5, 0.999, 1.0])
    assert out.columns == ["q50", "q99_9", "q100"]
    with pytest.raises(ValueError, match="duplicate"):
        merge_quantiles(daily, [], [0.5, 0.5])
