"""Scaling-slope evidence for the ANN / embedding operators (VERDICT r8
task #6 — the dedup families have measured slopes in scaling_slope.py;
this closes the same gap for the similarity stack).

The 100-TB argument for the ANN search paths is that a FIXED query
batch costs ~linear (or better) in corpus size because candidate
generation is bucketed (LSH), list-pruned (IVF), or an integer-code
scan against a broadcast lookup table (PQ-ADC) — never query x corpus
brute force — and that SemDeDup's pair join stays bounded per cluster
when n_clusters grows with the corpus. This tool MEASURES that: each
op is timed (min of RUNS) at three scales —

  sf0.01 embeddings        (  500 vecs)
  sf0.1  embeddings        ( 2000 vecs)
  synthetic 10x of sf0.1   (20000 vecs; each copy's vector is
                            circularly SHIFTED by the copy index so
                            copies decorrelate instead of becoming
                            10-way exact semantic duplicates, which
                            would inflate every cluster/bucket)

with a fixed 50-query batch (the serving shape: query volume does not
grow with the corpus), and reports the log-log slope between
consecutive scales: slope = log(t2/t1) / log(n2/n1); 1.0 = perfectly
linear in corpus size, <= ~1.3 is the acceptance bar. Index
construction (ivf_index KMeans, pq_fit, pq_encode) runs OUTSIDE the
timer — at 100 TB those are amortized build steps over a persisted
index, not per-query work; semantic_dedup is a whole-corpus pass so
its timer includes its ivf_index call, with n_clusters scaled to hold
per-cluster width ~constant (the operator's documented contract).

Usage: python tools/ann_slope.py [runs]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
DIM = 64
N_QUERIES = 50


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.operators.similarity import (
        ivf_batch_topk,
        ivf_index,
        lsh_batch_topk,
        pq_batch_topk,
        pq_encode,
        pq_fit,
        semantic_dedup,
    )

    spark = get_session("ann_slope")

    small = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    mid = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    # synthetic 10x: replicate with shifted ids and a per-copy circular
    # shift of the vector (copy 0 = original) so copies decorrelate
    copies = spark.range(10).select(F.col("id").alias("_copy"))
    shifted = F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(F.col("embedding"), F.col("_copy") + 1, F.lit(DIM) - F.col("_copy")),
            F.slice(F.col("embedding"), 1, F.col("_copy")),
        )
    )
    big = (
        mid.crossJoin(F.broadcast(copies))
        .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * 1_000_000)
        .withColumn("embedding", shifted)
        .drop("_copy")
        .localCheckpoint(eager=True)
    )
    scales = [("sf0.01", small, 500), ("sf0.1", mid, 2000), ("sf0.1x10", big, 20000)]

    # fixed serving-shape query batch, same at every scale; built from
    # the smallest corpus so the query set is identical across scales
    queries = small.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)

    # per-scale amortized index builds (outside the timers)
    prebuilt: dict[str, dict] = {}
    for label, d, n in scales:
        n_lists = max(8, n // 125)  # ~125 vecs/list at every scale
        assigned, centers = ivf_index(d, "embedding", n_lists=n_lists)
        assigned = assigned.localCheckpoint(eager=True)
        books = pq_fit(d, "embedding", m=8, k=16)
        codes = pq_encode(d, books, "embedding", "vec_id").localCheckpoint(eager=True)
        prebuilt[label] = dict(
            assigned=assigned, centers=centers, books=books, codes=codes,
            n_clusters=max(4, n // 125),
        )

    def op_lsh(label, d):
        return lsh_batch_topk(
            queries, d, "embedding", "vec_id", "vec_id", dim=DIM, k=10,
            n_planes=12, multiprobe_bits=1,
        )

    def op_ivf(label, d):
        b = prebuilt[label]
        return ivf_batch_topk(
            b["assigned"], b["centers"], queries, "embedding", "vec_id",
            "vec_id", k=10, n_probe=3,
        )

    def op_pq(label, d):
        b = prebuilt[label]
        return pq_batch_topk(
            queries, b["codes"], b["books"], "embedding", "vec_id",
            "vec_id", k=10,
        )

    def op_semdedup(label, d):
        return semantic_dedup(
            d, "embedding", "vec_id",
            n_clusters=prebuilt[label]["n_clusters"], threshold=0.95,
        )

    ops = [
        ("lsh_batch_topk", op_lsh),
        ("ivf_batch_topk", op_ivf),
        ("pq_batch_topk", op_pq),
        ("semantic_dedup", op_semdedup),
    ]

    small.count(), mid.count(), big.count()  # warm JVM + footers

    print(f"{'op':<16} {'scale':<9} {'vecs':>6} {'sec':>7} {'rows':>8} {'slope':>6}")
    results: dict[str, list[tuple[int, float]]] = {}
    for name, fn in ops:
        prev = None
        for label, d, n in scales:
            best, rows = None, 0
            for _ in range(RUNS):
                t0 = time.time()
                rows = fn(label, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            slope = ""
            if prev is not None:
                pn, pt = prev
                slope = f"{math.log(best / pt) / math.log(n / pn):.2f}"
            print(f"{name:<16} {label:<9} {n:>6} {best:>7.2f} {rows:>8} {slope:>6}", flush=True)
            results.setdefault(name, []).append((n, best))
            prev = (n, best)
    bad = []
    for name, pts in results.items():
        (n1, t1), (n2, t2) = pts[-2], pts[-1]
        s = math.log(t2 / t1) / math.log(n2 / n1)
        if s > 1.3:
            bad.append((name, round(s, 2)))
    if bad:
        print(f"\nSUPERLINEAR at top scale (> 1.3): {bad}")
        sys.exit(1)
    print("\nall ANN ops within the ~1.3x-linear slope bar at the top scale")


if __name__ == "__main__":
    main()
