"""Bloom seen-set invariants: zero false negatives, bounded false
positives, mergeability, bitmap compactness, and the broadcast plan
shape (the 100-TB contract: probe never shuffles, history never
re-scanned)."""

import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_flag_seen,
    bloom_merge,
    theoretical_fp_rate,
)

M, K = 1 << 14, 4


def _corpus(spark, n=400, tag="h"):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{tag}-doc "), F.col("id").cast("string")).alias("text"),
    )


@pytest.mark.parametrize("hash", ["xxhash64", "md5"])
def test_no_false_negatives(spark, hash):
    hist = _corpus(spark, 400)
    words = bloom_build(hist, "text", M, K, hash=hash)
    flags = bloom_flag_seen(hist, words, "text", ["doc_id"], M, K, hash=hash)
    assert flags.filter(~F.col("maybe_seen")).count() == 0
    assert flags.count() == 400


@pytest.mark.parametrize("hash", ["xxhash64", "md5"])
def test_false_positive_rate_within_bound(spark, hash):
    hist = _corpus(spark, 400, "h")
    fresh = _corpus(spark, 1000, "fresh")  # disjoint payloads
    words = bloom_build(hist, "text", M, K, hash=hash)
    flags = bloom_flag_seen(fresh, words, "text", ["doc_id"], M, K, hash=hash)
    fp = flags.filter(F.col("maybe_seen")).count()
    # 3x the theoretical rate + absolute slack, same gate as bloom_fp_gate
    assert fp <= 3 * theoretical_fp_rate(400, M, K) * 1000 + 5


def test_bitmap_compact_and_mergeable(spark):
    a, b = _corpus(spark, 200, "a"), _corpus(spark, 200, "b")
    wa = bloom_build(a, "text", M, K)
    wb = bloom_build(b, "text", M, K)
    merged = bloom_merge(wa, wb)
    assert merged.count() <= M // 32
    # merged filter sees both halves with no false negatives
    both = a.unionByName(b)
    flags = bloom_flag_seen(both, merged, "text", ["doc_id"], M, K)
    assert flags.filter(~F.col("maybe_seen")).count() == 0
    # merge == build-over-union, word for word
    direct = bloom_build(both, "text", M, K)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_probe_plan_is_broadcast_no_shuffle_of_history(spark):
    hist = _corpus(spark, 300)
    words = bloom_build(hist, "text", M, K)
    flags = bloom_flag_seen(hist, words, "text", ["doc_id"], M, K)
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_unseen_value_definitively_absent(spark):
    hist = _corpus(spark, 50)
    words = bloom_build(hist, "text", M, K)
    probe = spark.createDataFrame(
        [(1, "h-doc 7"), (2, "definitely never ingested")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.maybe_seen
        for r in bloom_flag_seen(probe, words, "text", ["doc_id"], M, K).collect()
    }
    assert got[1] is True  # replayed doc must be flagged (no FN)
    # FP on a single probe at n=50, m=16384 is ~1e-10; definitive here
    assert got[2] is False
