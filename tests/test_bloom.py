"""Bloom seen-set invariants: zero false negatives, bounded false
positives, mergeability, bitmap compactness, and the broadcast plan
shape (the 100-TB contract: probe never shuffles, history never
re-scanned)."""

import pytest

from nba_data_pipeline_spark.sinks.store import read_store as _rs
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


# ---------------------------------------------------------------------------
# continuous-ingest wiring (streaming/ops.py seen-content pre-filter)
# ---------------------------------------------------------------------------


def test_seen_content_filter_cold_start_passthrough(spark, tmp_path):
    from nba_data_pipeline_spark.streaming.ops import seen_content_filter_batch

    batch = _corpus(spark, 10)
    out = seen_content_filter_batch(
        batch, str(tmp_path / "bloom"), str(tmp_path / "hashes")
    )
    assert out.count() == 10
    assert out.columns == batch.columns


def test_seen_content_filter_round_trip(spark, tmp_path):
    from nba_data_pipeline_spark.streaming.ops import (
        record_ingested_content,
        seen_content_filter_batch,
    )

    bloom_p, hashes_p = str(tmp_path / "bloom"), str(tmp_path / "hashes")
    record_ingested_content(_corpus(spark, 50, "h"), bloom_p, hashes_p)
    # replayed content under NEW ids + genuinely new content
    replay = _corpus(spark, 50, "h").withColumn("doc_id", F.col("doc_id") + 1000)
    fresh = _corpus(spark, 20, "fresh")
    out = seen_content_filter_batch(replay.unionByName(fresh), bloom_p, hashes_p)
    texts = {r.text for r in out.collect()}
    assert len(texts) == 20 and all(t.startswith("fresh") for t in texts)
    # state is mergeable across batches: fold the fresh docs in too
    record_ingested_content(fresh, bloom_p, hashes_p)
    assert seen_content_filter_batch(fresh, bloom_p, hashes_p).count() == 0


def test_ingest_with_bloom_drops_replayed_content(spark, tmp_path):
    from pyspark.sql import types as T

    from nba_data_pipeline_spark.operators.text import fit_trigram_lm
    from nba_data_pipeline_spark.streaming.ops import corpus_ingest_batch

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    good = "the quick brown fox jumps and runs with great energy today " * 6
    other = "a calm grey owl watches the quiet forest and waits for night " * 6
    lm = fit_trigram_lm(spark.createDataFrame([(0, good)], schema), "text")
    paths = {
        k: str(tmp_path / k)
        for k in ("corpus", "sigs", "pairs", "scores", "bloom", "hashes")
    }

    def ingest(rows):
        corpus_ingest_batch(
            spark.createDataFrame(rows, schema),
            lm, paths["corpus"], paths["sigs"], paths["pairs"], paths["scores"],
            bloom_path=paths["bloom"], hashes_path=paths["hashes"],
            num_perm=32, bands=16, threshold=0.3,
        )

    ingest([(1, good)])
    assert {r.doc_id for r in _rs(spark, paths["corpus"]).collect()} == {1}
    # same content under a new id is dropped BEFORE gating/signatures;
    # new content flows through
    ingest([(77, good), (2, other)])
    assert {r.doc_id for r in _rs(spark, paths["corpus"]).collect()} == {1, 2}
    assert {r.doc_id for r in _rs(spark, paths["sigs"]).collect()} == {1, 2}


def test_bloom_meta_sidecar_guards_parameter_mismatch(spark, tmp_path):
    """record_ingested_content persists the (m_bits, k, hash) family next
    to the word table; a probe or merge under different parameters must
    refuse rather than return silently wrong flags."""
    import os

    from nba_data_pipeline_spark.operators.bloom import check_bloom_meta
    from nba_data_pipeline_spark.streaming.ops import (
        record_ingested_content,
        seen_content_filter_batch,
    )

    bloom_p, hashes_p = str(tmp_path / "bloom"), str(tmp_path / "hashes")
    record_ingested_content(_corpus(spark, 30), bloom_p, hashes_p)
    assert os.path.exists(os.path.join(bloom_p, "_bloom_meta.json"))
    # matching family passes, mismatched raises — both probe and record
    check_bloom_meta(bloom_p, 1 << 24, 5)
    with pytest.raises(ValueError, match="mismatched parameters"):
        check_bloom_meta(bloom_p, 1 << 16, 4)
    with pytest.raises(ValueError, match="mismatched parameters"):
        seen_content_filter_batch(
            _corpus(spark, 5), bloom_p, hashes_p, m_bits=1 << 16, k=4
        )
    with pytest.raises(ValueError, match="mismatched parameters"):
        record_ingested_content(
            _corpus(spark, 5, "b"), bloom_p, hashes_p, m_bits=1 << 16, k=4
        )
    # the sidecar survives the write-temp-then-swap of a second record
    record_ingested_content(_corpus(spark, 5, "b"), bloom_p, hashes_p)
    assert os.path.exists(os.path.join(bloom_p, "_bloom_meta.json"))


def test_record_crash_leaves_seen_state_intact(spark, tmp_path):
    """A failed word-table rewrite must not destroy the historical
    seen-bits: the rewrite goes write-temp-then-swap, so a mid-write
    crash leaves the old table readable and the filter still drops
    all previously ingested content."""
    from nba_data_pipeline_spark.streaming.ops import (
        record_ingested_content,
        seen_content_filter_batch,
    )

    bloom_p, hashes_p = str(tmp_path / "bloom"), str(tmp_path / "hashes")
    record_ingested_content(_corpus(spark, 40), bloom_p, hashes_p)
    # a batch whose text column raises at EXECUTION time (ANSI
    # assert_true), i.e. during the temp write — after the merge plan
    # is built, before any swap
    poison = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.assert_true(F.col("id") < F.lit(2)).isNull(),
            F.concat(F.lit("p"), F.col("id").cast("string")),
        ).alias("text"),
    )
    with pytest.raises(Exception):
        record_ingested_content(poison, bloom_p, hashes_p)
    # history survived: every original doc is still flagged seen
    out = seen_content_filter_batch(_corpus(spark, 40), bloom_p, hashes_p)
    assert out.count() == 0
