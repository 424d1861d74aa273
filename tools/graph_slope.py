"""Scaling-slope evidence for the graph operators (triangle counting,
component stats) — the graph-side companion of tools/scaling_slope.py.

Triangle counting's 100-TB argument is the degree orientation: wedges
generate at their minimum-degree endpoint, so hubs do not explode the
wedge join. This tool measures wall time on deterministic synthetic
graphs at two sizes (constant average degree, so linear scaling is the
correct expectation) PLUS a hub-skewed variant at the large size (one
vertex linked to 2% of all vertices — the shape that goes quadratic
without orientation). Acceptance: size slope <= ~1.3, and the skewed
graph within ~2x of the uniform graph at equal edge count.

Usage: python tools/graph_slope.py [runs]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.operators.graph import triangle_counts

    spark = get_session("graph_slope")

    def uniform_graph(n_edges: int, avg_degree: int):
        n_nodes = max(2, 2 * n_edges // avg_degree)
        return (
            spark.range(n_edges)
            .select(
                F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n_nodes)).alias("src"),
                F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(n_nodes)).alias("dst"),
            )
            .localCheckpoint(eager=True)
        )

    def hub_graph(n_edges: int, avg_degree: int):
        # same edge count, but 2% of vertices rewired onto vertex 0
        n_nodes = max(2, 2 * n_edges // avg_degree)
        base = uniform_graph(n_edges - n_nodes // 50, avg_degree)
        hub = spark.range(n_nodes // 50).select(
            F.lit(0).cast("long").alias("src"),
            (F.pmod(F.xxhash64("id"), F.lit(n_nodes - 1)) + 1).alias("dst"),
        )
        return base.unionByName(hub).localCheckpoint(eager=True)

    cases = [
        ("uniform-100k", uniform_graph(100_000, 10), 100_000),
        ("uniform-1M", uniform_graph(1_000_000, 10), 1_000_000),
        ("hub-1M", hub_graph(1_000_000, 10), 1_000_000),
    ]

    print(f"{'graph':<14} {'edges':>8} {'sec':>7} {'triangles':>10}")
    times: dict[str, float] = {}
    for label, g, n in cases:
        best, tri = None, 0
        for _ in range(RUNS):
            t0 = time.time()
            tri = triangle_counts(g).agg(F.sum("triangles")).collect()[0][0] or 0
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[label] = best
        print(f"{label:<14} {n:>8} {best:>7.2f} {tri // 3:>10}", flush=True)

    slope = math.log(times["uniform-1M"] / times["uniform-100k"]) / math.log(10)
    skew_ratio = times["hub-1M"] / times["uniform-1M"]
    print(f"\nsize slope (100k->1M edges): {slope:.2f}  (bar <= 1.3)")
    print(f"hub-skew ratio at 1M edges: {skew_ratio:.2f}x  (bar <= ~2x)")
    if slope > 1.3 or skew_ratio > 2.5:
        sys.exit(1)
    print("triangle counting within the linearity + skew bars")


if __name__ == "__main__":
    main()
