from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.graph import (
    canonical_edges,
    degree_stats,
    pagerank,
    triangle_counts,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_canonical_edges_dedups_and_drops_loops(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)])
    got = sorted(tuple(r) for r in canonical_edges(e).collect())
    assert got == [(1, 2), (2, 4)]


def test_degree_stats_undirected(spark):
    # path 1-2-3 plus isolated-by-loop 4-4 (dropped)
    e = _edges(spark, [(1, 2), (3, 2), (4, 4)])
    got = {r["node"]: r["degree"] for r in degree_stats(e).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_degree_stats_directed(spark):
    e = _edges(spark, [(1, 2), (1, 3), (3, 1)])
    got = {
        r["node"]: (r["out_degree"], r["in_degree"], r["degree"])
        for r in degree_stats(e, directed=True).collect()
    }
    assert got == {1: (2, 1, 3), 2: (0, 1, 1), 3: (1, 1, 2)}


def test_triangle_counts_k4_plus_pendant(spark):
    # K4 on {1,2,3,4}: every vertex is in C(3,2) = 3 triangles;
    # pendant vertex 5 attached to 1 closes none but must appear with 0.
    k4 = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    e = _edges(spark, k4 + [(1, 5)])
    got = {r["node"]: r["triangles"] for r in triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_counts_matches_bruteforce_on_random_graph(spark):
    # deterministic pseudo-random graph; brute force over vertex triples
    rows = [
        (a, b)
        for a, b in itertools.combinations(range(12), 2)
        if (a * 31 + b * 17) % 3 == 0
    ]
    e = _edges(spark, rows)
    adj = set(rows) | {(b, a) for a, b in rows}
    expected = {v: 0 for v in {x for r in rows for x in r}}
    for a, b, c in itertools.combinations(sorted(expected), 3):
        if (a, b) in adj and (a, c) in adj and (b, c) in adj:
            expected[a] += 1
            expected[b] += 1
            expected[c] += 1
    got = {r["node"]: r["triangles"] for r in triangle_counts(e).collect()}
    assert got == expected


def _pagerank_py(edges, damping, iterations, undirected=False):
    """Independent reference power iteration (plain dicts)."""
    es = set()
    for s, d in edges:
        if s == d:
            continue
        es.add((s, d))
        if undirected:
            es.add((d, s))
    nodes = sorted({x for e in es for x in e})
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _ in es:
        out[s] += 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if out[v] == 0)
        inflow = {v: 0.0 for v in nodes}
        for s, d in es:
            inflow[d] += rank[s] / out[s]
        rank = {
            v: (1.0 - damping) / n + damping * (inflow[v] + dangling / n)
            for v in nodes
        }
    return rank


@pytest.mark.parametrize("undirected", [False, True])
def test_pagerank_matches_reference_power_iteration(spark, undirected):
    # includes a dangling vertex (4 has no out-edges in directed mode)
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (5, 1), (5, 4)]
    e = _edges(spark, edges)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, damping=0.85, iterations=12, undirected=undirected).collect()
    }
    want = _pagerank_py(edges, 0.85, 12, undirected=undirected)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_graph(spark):
    e = _edges(spark, []).filter(F.lit(False))
    assert pagerank(e).count() == 0


@pytest.mark.parametrize("undirected", [False, True])
def test_pagerank_fixedpoint_tracks_float_kernel(spark, undirected):
    """The integer fixed-point kernel (the oracle-able form) must agree
    with the float kernel to within the truncation budget: each of the
    k iterations floors at most 1/scale per term, so after 8 rounds on
    this graph rank_e/scale is within ~1e-9 of the float rank."""
    from nba_data_pipeline_spark.operators.graph import pagerank_fixedpoint

    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (5, 1), (5, 4)]
    e = _edges(spark, edges)
    scale = 10**12
    fixed = {
        r["node"]: r["rank_e"]
        for r in pagerank_fixedpoint(
            e, iterations=8, scale=scale, undirected=undirected
        ).collect()
    }
    flt = {
        r["node"]: r["rank"]
        for r in pagerank(e, damping=0.85, iterations=8, undirected=undirected).collect()
    }
    assert set(fixed) == set(flt)
    for v in flt:
        assert fixed[v] / scale == pytest.approx(flt[v], abs=1e-7)
    # determinism: a repartitioned input yields bit-identical ranks
    fixed2 = {
        r["node"]: r["rank_e"]
        for r in pagerank_fixedpoint(
            e.repartition(7), iterations=8, scale=scale, undirected=undirected
        ).collect()
    }
    assert fixed2 == fixed


def test_component_stats_density(spark):
    from nba_data_pipeline_spark.operators.graph import component_stats

    # component A: triangle {1,2,3} -> density 1.0 (e6)
    # component B: chain 10-11-12-13 -> 3 edges, n=4 -> 2*3/(4*3) = 0.5
    # component C: single edge {20,21} -> density 1.0
    e = _edges(spark, [(1, 2), (2, 3), (1, 3),
                       (10, 11), (11, 12), (12, 13),
                       (20, 21), (21, 20)])  # duplicate/reversed edge collapses
    got = {
        r.component_id: (r.n_nodes, r.n_edges, r.density_e6)
        for r in component_stats(e).collect()
    }
    assert got[1] == (3, 3, 1_000_000)
    assert got[10] == (4, 3, 500_000)
    assert got[20] == (2, 1, 1_000_000)
