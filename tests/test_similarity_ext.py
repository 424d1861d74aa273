import random

from nba_data_pipeline_spark.operators.similarity import (
    batch_topk,
    brute_force_topk,
    ivf_index,
    ivf_topk,
)


def _clustered(spark, n=120, dim=12, n_centers=6, seed=3):
    rng = random.Random(seed)
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_centers)]
    rows = [
        (i, [x + rng.uniform(-0.05, 0.05) for x in centers[i % n_centers]], i % n_centers)
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_batch_topk_each_query_finds_itself(spark):
    rows, df = _clustered(spark)
    queries = df.filter("vec_id < 4")
    out = batch_topk(queries, df, "embedding", "vec_id", "vec_id", k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rnk, r.corpus_id))
    assert set(got) == {0, 1, 2, 3}
    for qid, hits in got.items():
        assert sorted(hits)[0] == (1, qid)  # rank-1 hit is the query itself


def test_ivf_topk_recall_vs_exact(spark):
    rows, df = _clustered(spark)
    query = rows[7][1]
    assigned, centers = ivf_index(df, "embedding", n_lists=6, max_iter=8)
    exact = {r.vec_id for r in brute_force_topk(df, "embedding", query, k=5).collect()}
    approx = {
        r.vec_id
        for r in ivf_topk(assigned, centers, "embedding", query, k=5, n_probe=2).collect()
    }
    assert len(exact & approx) >= 4  # clustered data: probing 2/6 lists recovers top-5
    assert 7 in approx


def test_normalize_and_quantize_embeddings(spark):
    from nba_data_pipeline_spark.operators.similarity import (
        dequantize_embeddings,
        norm,
        normalize_embeddings,
        quantize_embeddings,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    nrm = normalize_embeddings(df, "embedding", "nvec")
    rows = {r.vec_id: r.nvec for r in nrm.collect()}
    assert rows[1] == [0.6, 0.8]
    assert rows[2] == [None, None]  # zero vector -> NULLs, not a crash

    q = quantize_embeddings(df, "embedding")
    qr = {r.vec_id: (r.qscale, r.qvec) for r in q.collect()}
    assert qr[1][1] == [95, 127]          # 3/ (4/127) = 95.25 -> 95
    assert qr[2][0] is None and qr[2][1] == [0, 0]
    assert qr[3][1] == [-64, 127]         # -1/(2/127) = -63.5 -> HALF_UP -> -64

    deq = dequantize_embeddings(q, out_col="back")
    err = deq.filter("vec_id = 1").select(
        F.aggregate(
            F.zip_with("embedding", "back", lambda a, b: F.abs(a - b)),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("e")
    ).collect()[0]["e"]
    assert err <= (4.0 / 127.0) / 2 + 1e-12


def test_batch_topk_shuffle_path_matches_broadcast(spark):
    """broadcast_queries=False must give identical results (only the
    join strategy changes) and the plan must carry no broadcast hint."""
    rows, df = _clustered(spark)
    queries = df.filter("vec_id < 4")
    hinted = batch_topk(queries, df, "embedding", "vec_id", "vec_id", k=3)
    unhinted = batch_topk(
        queries, df, "embedding", "vec_id", "vec_id", k=3, broadcast_queries=False
    )
    assert sorted(map(tuple, hinted.collect())) == sorted(map(tuple, unhinted.collect()))


def test_lsh_and_ivf_batch_shuffle_path_matches_broadcast(spark):
    from nba_data_pipeline_spark.operators.similarity import (
        ivf_batch_topk,
        lsh_batch_topk,
    )

    rows, df = _clustered(spark)
    queries = df.filter("vec_id < 3")
    a = lsh_batch_topk(queries, df, "embedding", "vec_id", "vec_id", dim=12, k=3)
    b = lsh_batch_topk(
        queries, df, "embedding", "vec_id", "vec_id", dim=12, k=3,
        broadcast_queries=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assigned, centers = ivf_index(df, "embedding", n_lists=6, max_iter=8)
    c = ivf_batch_topk(assigned, centers, queries, "embedding", "vec_id", "vec_id", k=3)
    d = ivf_batch_topk(
        assigned, centers, queries, "embedding", "vec_id", "vec_id", k=3,
        broadcast_queries=False,
    )
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, d.collect()))


def test_rerank_topk_fake_scorer(spark):
    """Weighted-sum rerank over candidates: scores, ordering, ties, k."""
    import pytest

    from nba_data_pipeline_spark.operators.similarity import rerank_topk

    cand = spark.createDataFrame(
        [
            (1, 10, 0.9, 2.0),
            (1, 11, 0.8, 20.0),   # big second feature wins with weight
            (1, 12, 0.9, 2.0),    # exact tie with corpus 10 -> id order
            (2, 10, 0.5, 1.0),
        ],
        "query_id long, corpus_id long, cos_sim double, aux double",
    )
    out = rerank_topk(
        cand, "query_id", "corpus_id", [("cos_sim", 1.0), ("aux", 0.1)], k=2
    ).collect()
    got = {(r.query_id, r.rnk): (r.corpus_id, r.rerank_score) for r in out}
    assert got[(1, 1)] == (11, 2.8)   # 0.8 + 2.0
    assert got[(1, 2)] == (10, 1.1)   # tie 1.1 with 12; lower id wins
    assert got[(2, 1)] == (10, 0.6)
    assert len(out) == 3  # k=2 cap on query 1, one row on query 2

    with pytest.raises(NotImplementedError, match="cross-encoder"):
        rerank_topk(cand, "query_id", "corpus_id", [("cos_sim", 1.0)], scorer="real")
    with pytest.raises(ValueError, match="scorer"):
        rerank_topk(cand, "query_id", "corpus_id", [("cos_sim", 1.0)], scorer="bogus")


def test_pq_encode_deterministic_and_compact(spark):
    from nba_data_pipeline_spark.operators.similarity import pq_encode, pq_fit

    rows = [(i, [float((i * 7 + j * 3) % 13) for j in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_fit(df.orderBy("vec_id").coalesce(1), "embedding", m=4, k=8, max_iter=5)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    codes1 = {r.vec_id: list(r.codes) for r in pq_encode(df, books, "embedding", "vec_id").collect()}
    codes2 = {r.vec_id: list(r.codes) for r in pq_encode(df, books, "embedding", "vec_id").collect()}
    assert codes1 == codes2
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in codes1.values())


def test_pq_adc_retrieves_exact_vector_as_top1(spark):
    from nba_data_pipeline_spark.operators.similarity import (
        pq_batch_topk,
        pq_encode,
        pq_fit,
    )

    # well-separated cluster structure: PQ is lossy but cluster-scale
    # distances survive quantization
    rows = [
        (c * 100 + i, [float(c * 50 + ((i * j) % 5)) for j in range(8)])
        for c in range(4)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_fit(df.orderBy("vec_id").coalesce(1), "embedding", m=2, k=8, max_iter=10)
    codes = pq_encode(df, books, "embedding", "vec_id")
    qs = df.filter(df.vec_id.isin(0, 101, 202, 303))
    top = pq_batch_topk(qs, codes, books, "embedding", "vec_id", k=5).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        # every top-5 hit must come from the query's own cluster
        assert all(r.corpus_id // 100 == qid // 100 for r in rs), (qid, rs)
        assert rs[0].rnk == 1


def test_semantic_dedup_collapses_planted_near_identical_vectors(spark):
    from nba_data_pipeline_spark.operators.similarity import semantic_dedup

    import math

    # 3 well-separated base directions; for each, 4 near-identical
    # copies (tiny deterministic jitter) + 1 genuinely distinct vector
    rows = []
    for c in range(3):
        base = [math.cos(0.5 * c + 0.1 * j) for j in range(8)]
        for i in range(4):
            rows.append((c * 10 + i, [float(v + 0.001 * i) for v in base]))
        rows.append((c * 10 + 9, [float(-v) for v in base]))  # antipode: distinct
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(
        df.orderBy("vec_id").coalesce(1), "embedding", "vec_id",
        n_clusters=4, threshold=0.999,
    )
    rowsr = {r.vec_id: r for r in out.collect()}
    assert len(rowsr) == 15
    for c in range(3):
        comps = {rowsr[c * 10 + i].component_id for i in range(4)}
        assert len(comps) == 1, f"cluster {c} copies must share a component"
        canon = [i for i in range(4) if rowsr[c * 10 + i].is_canonical]
        assert canon == [0]  # min-id survivor
        assert rowsr[c * 10 + 9].is_canonical  # antipode survives alone
    kept = sum(1 for r in rowsr.values() if r.is_canonical)
    assert kept == 6  # 3 canonical + 3 antipodes


def test_semantic_dedup_priority_survivor(spark):
    from nba_data_pipeline_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0.2),
        (2, [1.0, 0.001, 0.0, 0.0], 0.9),  # higher quality -> survivor
        (3, [0.0, 1.0, 0.0, 0.0], 0.5),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, q double")
    out = {r.vec_id: r for r in semantic_dedup(
        df.orderBy("vec_id").coalesce(1), "embedding", "vec_id",
        n_clusters=2, threshold=0.999, priority_col="q",
    ).collect()}
    assert not out[1].is_canonical and out[2].is_canonical
    assert out[1].component_id == out[2].component_id  # stable min-id cluster key
    assert out[3].is_canonical


def test_semantic_contamination_flags_planted_copies(spark):
    from nba_data_pipeline_spark.operators.similarity import semantic_contamination

    bench = spark.createDataFrame(
        [(100, "a", [1.0, 0.0, 0.0]), (101, "a", [0.0, 1.0, 0.0])],
        "vec_id long, label string, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0, 0.0]),     # exact copy of bench 100
            (2, "a", [0.9, 0.1, 0.0]),     # near bench 100
            (3, "a", [0.0, 0.0, 1.0]),     # orthogonal to both
            (4, "b", [1.0, 0.0, 0.0]),     # same vector, other block -> unseen
        ],
        "vec_id long, label string, embedding array<double>",
    )
    out = {r.corpus_id: r for r in semantic_contamination(
        corpus, bench, "embedding", "vec_id", block_cols=["label"], threshold=0.8
    ).collect()}
    assert set(out) == {1, 2}
    assert out[1].max_cos == 1.0 and out[1].n_bench_hits == 1
    assert 0.8 <= out[2].max_cos < 1.0
    # blockless mode: the cross-block copy is now caught via broadcast crossJoin
    out2 = {r.corpus_id for r in semantic_contamination(
        corpus, bench, "embedding", "vec_id", threshold=0.8).collect()}
    assert out2 == {1, 2, 4}


def test_ranking_metrics_mrr_recall_and_zero_hit_queries(spark):
    from nba_data_pipeline_spark.operators.similarity import ranking_metrics

    run = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3),
         (2, 200, 1), (2, 201, 2)],
        "query_id long, doc_id long, rank long",
    )
    gold = spark.createDataFrame(
        [(1, 101), (1, 102), (1, 999),   # q1: hits at ranks 2,3; one unreachable
         (2, 555),                       # q2: gold never retrieved
         (3, 300)],                      # q3: no run rows at all
        "query_id long, doc_id long",
    )
    out = {r.query_id: r for r in ranking_metrics(run, gold, k=2).collect()}
    # k=2 truncates the run: q1 keeps ranks 1,2 -> one hit (101 at rank 2)
    assert out[1].n_gold == 3 and out[1].n_hits_at_k == 1
    # standard recall@k = hits / n_gold (NOT capped at k): 1/3
    assert out[1].recall_at_k == 0.333333 and out[1].mrr == 0.5
    assert out[2].n_hits_at_k == 0 and out[2].mrr == 0.0 and out[2].recall_at_k == 0.0
    assert out[3].n_hits_at_k == 0 and out[3].mrr == 0.0  # absent query still scored


def test_jl_project_variance_correct_scale(spark):
    """Projected squared distances must be UNBIASED estimates of the
    originals (the sqrt(3/k) scale for U[-1,1] entries): over many
    pairs the mean ratio sits near 1, not near 1/3."""
    import random

    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.similarity import jl_project

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj = jl_project(df, "embedding", 64, 16)
    sq = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda a, x: a + x
    )
    a = proj.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"), F.col("embedding_jl").alias("pa"))
    b = proj.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"), F.col("embedding_jl").alias("pb"))
    pairs = a.crossJoin(b).filter("ia < ib").select(
        (sq(F.col("pa"), F.col("pb")) / sq(F.col("va"), F.col("vb"))).alias("ratio")
    )
    mean_ratio = pairs.agg(F.avg("ratio")).collect()[0][0]
    assert 0.85 <= mean_ratio <= 1.15, mean_ratio
    # deterministic across calls; output dimension honored
    r1 = proj.select("embedding_jl").collect()
    r2 = jl_project(df, "embedding", 64, 16).select("embedding_jl").collect()
    assert r1 == r2 and len(r1[0][0]) == 16

    import pytest as _p
    with _p.raises(ValueError):
        jl_project(df, "embedding", 64, 0)
