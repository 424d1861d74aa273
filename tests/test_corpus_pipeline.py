from pyspark.sql import functions as F

from nba_data_pipeline_spark.plans.corpus_pipeline import corpus_pipeline, corpus_summary


def _docs(spark):
    good = (
        "the quick brown fox jumps over the lazy dog while the keen red "
        "hen walks under a tall green tree near the old stone wall today"
    )
    rows = [
        (1, good),                                   # survives
        (2, good.upper()),                           # exact dup of 1 after normalize
        (3, good + " extra tail words here"),        # near dup of 1 -> same cluster
        (4, "spam spam spam spam spam spam spam spam spam spam"),  # repetitive junk
        (5, "x"),                                    # too short / low quality
        (6, "an entirely different and quite long document about the sea "
            "and the ships that sail upon it every single morning in june"),
        (7, "the secret exam answer is forty two exactly as was written "
            "in the margin of the famous old book by the brilliant author"),  # contaminated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the secret exam answer is forty two")], "doc_id long, text string"
    )


def test_corpus_pipeline_end_to_end(spark):
    out = corpus_pipeline(
        _docs(spark), _bench(spark), min_quality=0.25,
        near_dup_threshold=0.5, pack_capacity=64, num_shards=4,
    )
    rows = {r.doc_id: r for r in out.collect()}
    # doc 1 survives as the canonical of {1, 2(exact), 3(near)}
    assert 1 in rows and 2 not in rows and 3 not in rows
    # junk and low-quality are gone before any join
    assert 4 not in rows and 5 not in rows
    # clean long doc survives; contaminated doc is dropped
    assert 6 in rows and 7 not in rows
    for r in rows.values():
        assert r.split in ("train", "val", "test")
        assert r.pack_id == r.start_offset // 64
        assert r.n_tokens > 0


def test_corpus_summary_shape(spark):
    out = corpus_pipeline(
        _docs(spark), _bench(spark), pack_capacity=64, num_shards=4
    )
    summ = corpus_summary(out).collect()
    assert sum(r.n_docs for r in summ) == out.count()
    for r in summ:
        assert r.n_tokens > 0 and r.n_packs >= 1


def test_corpus_pipeline_is_deterministic(spark):
    """Retry-safety at cluster scale: two independent invocations over
    the same input must produce identical rows (all stages are
    hash-deterministic — no rand(), no partition-order dependence)."""
    a = corpus_pipeline(_docs(spark), _bench(spark), pack_capacity=64, num_shards=4)
    b = corpus_pipeline(_docs(spark), _bench(spark), pack_capacity=64, num_shards=4)
    cols = ["doc_id", "component_id", "split", "shard", "n_tokens",
            "start_offset", "pack_id"]
    ra = sorted(map(tuple, a.select(*cols).collect()))
    rb = sorted(map(tuple, b.select(*cols).collect()))
    assert ra == rb and len(ra) > 0


def test_release_corpus_writes_per_split_shards(spark, tmp_path):
    import os

    from nba_data_pipeline_spark.plans.corpus_pipeline import release_corpus

    base = "the quick brown fox jumps over the lazy dog near the river bank today "
    docs = spark.createDataFrame(
        [(i, base + f"variant {i} " + "filler words here and there " * 3) for i in range(60)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(999, "completely separate benchmark sentence with unique words")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "release")
    stats = release_corpus(
        docs, bench, out, n_output_shards=4,
        min_quality=0.0, max_dup_bigram_ratio=1.0, near_dup_threshold=0.9,
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    assert set(stats) <= {"train", "val", "test"} and "train" in stats
    total = sum(s["rows"] for s in stats.values())
    for split, s in stats.items():
        d = os.path.join(out, split)
        back = spark.read.parquet(d)
        assert back.count() == s["rows"]
        dirs = {x for x in os.listdir(d) if x.startswith("shard=")}
        assert dirs and dirs <= {f"shard={i}" for i in range(4)}  # small splits may skip shards
        # no cross-split leakage on disk: every row carries its split
        assert {r.split for r in back.select("split").distinct().collect()} == {split}
    summary = spark.read.parquet(os.path.join(out, "_summary"))
    assert {r.split for r in summary.collect()} >= set(stats)
    assert total == sum(r.n_docs for r in summary.collect() if r.split in stats)


def test_corpus_pipeline_ngram_variant_matches_minhash_on_obvious_dups(spark):
    """Both pair methods must collapse the same obvious duplicate
    cluster; pair_method only changes the candidate generator."""
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.plans.corpus_pipeline import corpus_pipeline

    base = "the quick brown fox jumps over the lazy dog and runs away again today "
    docs = spark.createDataFrame(
        [(1, base * 3), (2, base * 3 + "tiny tail"), (3, "a wholly different document "
          "with its own words and phrases that is long enough to pass the gate " * 2)],
        "doc_id long, text string",
    ).withColumn("len_band", F.lit(0))
    bench = spark.createDataFrame([(99, "benchmark only sentence")], "doc_id long, text string")
    kw = dict(min_quality=0.0, max_dup_bigram_ratio=1.0, near_dup_threshold=0.5,
              fractions={"train": 1.0}, pack_capacity=64, num_shards=2)
    a = corpus_pipeline(docs, bench, pair_method="minhash", **kw)
    b = corpus_pipeline(docs, bench, pair_method="ngram", pair_block_cols=["len_band"], **kw)
    for out in (a, b):
        ids = {r.doc_id for r in out.select("doc_id").collect()}
        assert ids == {1, 3}  # doc 2 collapsed into doc 1's cluster

    import pytest as _p
    with _p.raises(ValueError, match="pair_method"):
        corpus_pipeline(docs, bench, pair_method="bogus")
