import math
import random

from nba_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs,
    lsh_topk,
)


def _embeddings(spark, n=80, dim=16, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)], i % 4) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_self_is_best(spark):
    rows, df = _embeddings(spark)
    query = rows[5][1]
    top = brute_force_topk(df, "embedding", query, k=5).collect()
    assert top[0].vec_id == 5
    assert abs(top[0].cos_sim - 1.0) < 1e-4
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall_vs_brute_force(spark):
    # planted clusters: 8 centers, 10 perturbed members each -> true
    # neighbors are strongly correlated, the regime LSH is built for
    rng = random.Random(11)
    dim, rows = 16, []
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(8)]
    for i in range(80):
        c = centers[i % 8]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in c], i % 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    query = rows[3][1]
    exact = {r.vec_id for r in brute_force_topk(df, "embedding", query, k=5).collect()}
    approx = {r.vec_id for r in lsh_topk(df, "embedding", query, k=5, n_planes=6).collect()}
    assert len(exact & approx) >= 4
    assert 3 in approx  # the query itself always lands in its own bucket


def test_cosine_pairs_blocked(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.99, 0.01, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0], 1),  # different block: never paired with 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = cosine_pairs(df, "embedding", "vec_id", ["label"], threshold=0.95)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_lsh_batch_topk_matches_per_query_lsh(spark):
    """The declarative batch LSH (no driver loop) returns the same
    candidates+ranking as the single-query path for every query row."""
    from nba_data_pipeline_spark.operators.similarity import lsh_batch_topk

    rows, df = _embeddings(spark)
    qids = [3, 17, 42]
    queries = df.filter(df.vec_id.isin(qids))
    batch = lsh_batch_topk(
        queries, df, "embedding", "vec_id", "vec_id", dim=16, k=5, n_planes=6
    ).collect()
    got = {}
    for r in batch:
        got.setdefault(r.query_id, []).append((r.rnk, r.corpus_id, r.cos_sim))
    for qid in qids:
        single = lsh_topk(df, "embedding", rows[qid][1], k=5, n_planes=6).collect()
        want = [(i + 1, r.vec_id, r.cos_sim) for i, r in enumerate(single)]
        assert sorted(got[qid]) == want, f"query {qid}"


def test_ivf_batch_topk_matches_per_query_ivf(spark):
    """Declarative batch IVF probe == the single-query probe for every
    query (same index, same centers, same n_probe)."""
    from nba_data_pipeline_spark.operators.similarity import (
        ivf_batch_topk,
        ivf_index,
        ivf_topk,
    )

    rows, df = _embeddings(spark)
    assigned, centers = ivf_index(df.orderBy("vec_id").coalesce(1), "embedding", n_lists=4, max_iter=5)
    qids = [0, 9, 33]
    queries = df.filter(df.vec_id.isin(qids))
    batch = ivf_batch_topk(
        assigned, centers, queries, "embedding", "vec_id", "vec_id", k=5, n_probe=2
    ).collect()
    got = {}
    for r in batch:
        got.setdefault(r.query_id, []).append((r.rnk, r.corpus_id, r.cos_sim))
    for qid in qids:
        single = ivf_topk(
            assigned, centers, "embedding", rows[qid][1], k=5, n_probe=2
        ).collect()
        want = [(i + 1, r.vec_id, r.cos_sim) for i, r in enumerate(single)]
        assert sorted(got[qid]) == want, f"query {qid}"
