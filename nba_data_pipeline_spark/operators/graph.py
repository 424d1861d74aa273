"""Graph analytics over distributed edge lists: degrees, triangles,
PageRank.

The reference pipeline has no graph operators; these extend the
LLM-corpus surface where graphs appear constantly: the candidate-pair
output of MinHash/SimHash/winnowing IS an undirected graph
(``connected_components`` in dedup.py labels it; this module audits its
structure), link graphs drive crawl prioritization and per-domain
quality priors (PageRank over host graphs is the classic Common-Crawl
curation signal), and co-occurrence projections expose communities.

Scale notes (the shapes that survive 100 TB):

- Degrees are one hash aggregate over the edge list.
- Triangle enumeration uses the degree-orientation trick (Chiba-
  Nishizeki / "compact-forward"): orient every undirected edge from the
  endpoint with smaller (degree, id) to the larger, so every wedge is
  generated at its lowest-degree vertex. Wedge count drops from
  sum(deg^2) to sum over edges of min-degree — the difference between
  infeasible and linear-ish on power-law graphs. The joins shuffle on
  vertex id; no broadcast of anything O(V).
- PageRank is the standard iterative join (contributions = rank /
  out_degree shuffled to destinations) with ``localCheckpoint`` per
  round to truncate lineage — same pattern as ``connected_components``.
  Dangling mass is redistributed uniformly (the textbook correction)
  using one scalar collect per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_edges(
    df: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Undirected canonical form: (least, greatest) per edge, self-loops
    dropped, duplicates collapsed. Output columns: (src, dst) with
    src < dst. One hash aggregate; the edge list never hits the driver."""
    return (
        df.select(
            F.least(F.col(src), F.col(dst)).alias("src"),
            F.greatest(F.col(src), F.col(dst)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst", directed: bool = False
) -> DataFrame:
    """Per-vertex degrees.

    Undirected (default): canonicalizes first, returns (node, degree).
    Directed: returns (node, out_degree, in_degree, degree) where
    degree = out + in; vertices appearing only as source (or only as
    destination) get 0 for the missing side. One shuffle on vertex id.
    """
    # explode both endpoints from ONE pass over the edge frame — a
    # union of two selects re-executes the edge-building plan per
    # branch (for a derived edge list like the co-occurrence
    # projection that doubles the self-join, caught by the r12
    # full-registry plan audit), and at web-graph scale it doubles the
    # edge scan
    if not directed:
        e = canonical_edges(edges, src, dst)
        both = e.select(
            F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
        )
        return both.groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    pairs = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src).alias("node"),
                    F.lit(1).alias("o"),
                    F.lit(0).alias("i"),
                ),
                F.struct(
                    F.col(dst).alias("node"),
                    F.lit(0).alias("o"),
                    F.lit(1).alias("i"),
                ),
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.node").alias("node"))
        .agg(
            F.sum("p.o").cast("long").alias("out_degree"),
            F.sum("p.i").cast("long").alias("in_degree"),
        )
        .withColumn("degree", (F.col("out_degree") + F.col("in_degree")).cast("long"))
    )


def _oriented(edges: DataFrame) -> DataFrame:
    """Degree-orientation of a canonical undirected edge list: each edge
    points from the endpoint with the smaller (degree, id) to the
    larger. Output: (lo, hi) under that total order. Two broadcast-free
    joins against the degree table (shuffles key on vertex id)."""
    deg = degree_stats(edges)
    e = (
        edges.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("degree", "_ds")
        .join(deg.withColumnRenamed("node", "dst"), "dst")
        .withColumnRenamed("degree", "_dd")
    )
    fwd = F.struct("_ds", "src") < F.struct("_dd", "dst")
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected graph. Output:
    (node, triangles) for EVERY vertex of the graph (zero included —
    singleton-degree vertices close no triangles but still appear).

    Algorithm: degree-oriented wedge join. Wedges (u -> v, u -> w with
    v before w in the orientation order) are generated at their
    minimum-degree vertex, then closed against the oriented edge list —
    every triangle is found exactly once. Each closing triangle
    (u, v, w) credits all three vertices via one explode + hash agg.
    """
    e = canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    o = _oriented(e).localCheckpoint(eager=False)
    # wedge at u: u->v and u->w; impose v < w in plain id order to pick
    # each unordered neighbor pair once, then close with the oriented
    # edge between v and w (direction under the orientation is unknown,
    # so probe both — exactly one can exist).
    w1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    w2 = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = w1.join(w2, "u").filter(F.col("v") < F.col("w"))
    closing = o.select(
        F.least("lo", "hi").alias("v"), F.greatest("lo", "hi").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"])
    credited = tri.select(
        F.explode(F.array("u", "v", "w")).alias("node")
    ).groupBy("node").agg(F.count("*").cast("long").alias("triangles"))
    nodes = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    return nodes.join(credited, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    undirected: bool = False,
) -> DataFrame:
    """PageRank by power iteration. Output: (node, rank) with
    sum(rank) == 1 (up to FP error).

    ``undirected=True`` mirrors every edge first (the standard way to
    rank an undirected graph). Dangling vertices (no out-edges)
    redistribute their mass uniformly each round — without this the
    ranks leak and do not sum to 1. Each round: one join shuffling
    contributions to destinations + one hash agg + one scalar collect
    (the dangling mass); ``localCheckpoint`` truncates lineage exactly
    as ``connected_components`` does. Deterministic for a fixed graph
    and iteration count, but iterative — registered rows-only (no
    single-SQL oracle); tests/test_graph.py pins exact parity against
    an independent pure-Python power iteration on a fixture graph.
    """
    # loop-invariant frames persist over their join keys (NOT
    # localCheckpoint, whose ExistingRDD reports UnknownPartitioning):
    # the materialized caches keep hashpartitioning(s)/(node), so every
    # round's contributions join reuses the EDGE partitioning — only
    # the node-scale rank frame shuffles per iteration, not the
    # edge-scale list (E >= V; at web-graph scale E is the whole cost).
    # Trade-off: a shuffle-free co-partitioned join gives AQE no
    # shuffle stats to skew-split, so a hub's edges stay in one
    # partition — but hash partitioning concentrated them identically
    # BEFORE this change (one key -> one partition); the hub cost is
    # unchanged while every other partition stops paying the re-shuffle
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        e = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = e.distinct().filter(F.col("s") != F.col("d")).repartition("s").persist()
    e.count()

    nodes = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("out_degree"))
    # (node, out_degree) with dangling marked by out_degree = 0
    base = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
    ).repartition("node").persist()
    base.count()

    ranks = base.select("node", "out_degree", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        dangling = (
            ranks.filter(F.col("out_degree") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .select(
                "node",
                "out_degree",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    # final ranks are an eagerly checkpointed RDD — safe to drop the
    # loop-invariant caches
    e.unpersist()
    base.unpersist()
    return ranks.select("node", "rank")


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    undirected: bool = False,
) -> DataFrame:
    """PageRank by power iteration in INTEGER fixed point — the
    lm_perplexity trick applied to an iterative operator: every rank is
    a BIGINT multiple of 1/scale and every step uses integer division,
    so the result is EXACTLY engine-reproducible (integer sums commute;
    no float summation order to disagree on). This is what makes a
    full value-hash DuckDB oracle possible for an iterative algorithm.

    Per round (same plan shape as ``pagerank``): one contributions
    join + hash agg, one scalar dangling-mass collect, lineage
    truncated per round. rank_e ~= float_rank * scale; parity with the
    float kernel is pinned in tests/test_graph.py. Output:
    (node, rank_e BIGINT).
    """
    # same loop-invariant co-partitioning as ``pagerank`` (see the
    # comment there): edge cache partitioned on s, base on node
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        e = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = e.distinct().filter(F.col("s") != F.col("d")).repartition("s").persist()
    e.count()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.withColumn("rank_e", F.lit(0).cast("long"))
    outdeg = e.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("out_degree"))
    base = (
        nodes.join(outdeg, "node", "left")
        .select("node", F.coalesce("out_degree", F.lit(0)).alias("out_degree"))
        .repartition("node")
        .persist()
    )
    base.count()
    init = int(scale) // n
    teleport = ((damping_den - damping_num) * init) // damping_den
    ranks = base.select(
        "node", "out_degree", F.lit(init).cast("long").alias("rank_e")
    )
    for _ in range(iterations):
        dang = (
            ranks.filter(F.col("out_degree") == 0)
            .agg(F.coalesce(F.sum("rank_e"), F.lit(0)))
            .collect()[0][0]
        )
        share = int(dang) // n
        contribs = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                F.expr("rank_e DIV out_degree").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .select(
                "node",
                "out_degree",
                F.expr(
                    f"CAST({teleport} + ({damping_num} * (coalesce(inflow, 0)"
                    f" + {share})) DIV {damping_den} AS BIGINT)"
                ).alias("rank_e"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    base.unpersist()
    return ranks.select("node", "rank_e")


def component_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-component structure stats for an undirected graph — the
    quality audit of a dedup candidate graph: (component_id, n_nodes,
    n_edges, density_e6). Genuine near-dup clusters are dense
    (density near 1e6); long low-density chains mean borderline pairs
    chained transitively and the keep-one step is about to collapse
    documents that are NOT mutual near-dups. Density is e6 fixed
    point — 2E * 1e6 // (n(n-1)) — pure integers. Composes
    ``connected_components`` (dedup.py) with two hash aggregates;
    every shuffle keys on vertex/component id."""
    from .dedup import connected_components

    e = canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    comp = connected_components(
        e.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    nodes = comp.groupBy("component_id").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
    ecnt = (
        e.join(comp.withColumnRenamed("doc_id", "src"), "src")
        .groupBy("component_id")
        .agg(F.count("*").cast("long").alias("n_edges"))
    )
    n = F.col("n_nodes")
    return (
        nodes.join(ecnt, "component_id", "left")
        .select(
            "component_id",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.when(
                n > 1,
                F.floor(
                    F.lit(2) * F.coalesce("n_edges", F.lit(0)) * F.lit(1_000_000)
                    / (n * (n - F.lit(1)))
                ),
            ).otherwise(F.lit(0)).cast("long").alias("density_e6"),
        )
    )
