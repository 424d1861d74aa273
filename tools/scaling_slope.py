"""Scaling-slope evidence for the quadratic-candidate dedup operators
(VERDICT r6 task #5).

The 100-TB argument for the candidate-pair ops (winnowing, MinHash-LSH,
SimHash, n-gram Jaccard) rests on bucketed candidate generation keeping
pair counts ~linear in corpus size. This tool MEASURES that: each op is
timed (min of RUNS) at three scales —

  sf0.01 documents        (  500 docs)
  sf0.1  documents        ( 5000 docs)
  synthetic 10x of sf0.1  (50000 docs; each copy's text is prefixed
                           with a copy token so shingles shift and the
                           corpus doesn't degenerate into 10-way exact
                           duplicates, which would inflate every bucket)

and reports the log-log slope between consecutive scales:
slope = log(t2/t1) / log(n2/n1); 1.0 = perfectly linear, <= ~1.3 is
the acceptance bar (superlinear candidate growth stays bounded by the
hot-bucket caps: _prune_hot_fps, max_df_ratio, band star-caps).

Usage: python tools/scaling_slope.py [runs]
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
    from nba_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
        winnow_fingerprints,
        winnow_match_pairs,
    )

    spark = get_session("scaling_slope")

    def docs_at(path: str):
        return spark.read.parquet(path)

    small = docs_at("/root/testdata/sf0.01/documents.parquet")
    mid = docs_at("/root/testdata/sf0.1/documents.parquet")
    # synthetic 10x: replicate with shifted ids and a per-copy text
    # prefix (shifts every shingle/gram window) so near-dup structure
    # stays realistic instead of 10-way exact-dup
    copies = spark.range(10).select(F.col("id").alias("_copy"))
    big = (
        mid.crossJoin(F.broadcast(copies))
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * 1_000_000)
        .withColumn(
            "text",
            F.concat(F.lit("copy"), F.col("_copy").cast("string"), F.lit(" "), F.col("text")),
        )
        .drop("_copy")
        .localCheckpoint(eager=True)
    )
    scales = [("sf0.01", small, 500), ("sf0.1", mid, 5000), ("sf0.1x10", big, 50000)]

    def op_winnow(d):
        return winnow_match_pairs(winnow_fingerprints(d), min_shared=4, max_df_frac=0.05)

    def op_minhash(d):
        return minhash_lsh_pairs(
            d, "doc_id", "text", num_perm=32, bands=16, threshold=0.3, eager_probe=True
        )

    def op_simhash(d):
        return simhash_near_pairs(d, "doc_id", "text", max_hamming=12, eager_probe=True)

    def op_ngram(d):
        banded = d.withColumn("len_band", F.expr("n_chars div 64"))
        return ngram_jaccard_pairs(
            banded, "doc_id", "text", ["lang", "len_band"], n=3, threshold=0.3
        )

    ops = [
        ("winnow_pairs", op_winnow),
        ("minhash_lsh_pairs", op_minhash),
        ("simhash_pairs", op_simhash),
        ("ngram_jaccard", op_ngram),
    ]

    # warm: JVM + parquet footers
    small.count(), mid.count(), big.count()

    print(f"{'op':<20} {'scale':<9} {'docs':>6} {'sec':>7} {'rows':>8} {'slope':>6}")
    results: dict[str, list[tuple[int, float]]] = {}
    for name, fn in ops:
        prev = None
        for label, d, n in scales:
            best, rows = None, 0
            for _ in range(RUNS):
                t0 = time.time()
                rows = fn(d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            slope = ""
            if prev is not None:
                pn, pt = prev
                slope = f"{math.log(best / pt) / math.log(n / pn):.2f}"
            print(f"{name:<20} {label:<9} {n:>6} {best:>7.2f} {rows:>8} {slope:>6}", flush=True)
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
    print("\nall ops within the ~1.3x-linear slope bar at the top scale")


if __name__ == "__main__":
    main()
