"""Measured evidence for the bucketed merge-state claim (round 11):
the cost of MERGING a fixed batch into a persisted keyed state table —
whole-table rewrite vs pmod(xxhash64(key), N) hive buckets.

A fixed 1,000-row batch upserts into synthetic signature-shaped state
(doc_id BIGINT + 8-long minhash array) at three history sizes; min of
RUNS, state rebuilt per scale. Expectation mirrors the
fold_aggregate_state_table crossover already published in COVERAGE.md:
the whole-table rewrite is linear in history (slope ~1), the bucketed
merge tracks touched buckets only (flat once fixed costs amortize; a
1,000-key batch touches <= min(1000, N) of N buckets, so write volume
is ~batch_keys x history/N rows however large history grows).

Usage: python tools/merge_slope.py [runs]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SCALES = [100_000, 1_000_000, 5_000_000]
BUCKETS = 256


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.sinks.writer import upsert_table, write_table

    spark = get_session("merge_slope")

    def sigs(lo: int, n: int):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("doc_id"),
            F.array(*[F.xxhash64("id", F.lit(i)) for i in range(8)]).alias("minhash"),
        )

    batch = sigs(10_000_000, 1_000).localCheckpoint(eager=True)
    results: dict[str, dict[int, float]] = {"whole": {}, "bucketed": {}}
    work = tempfile.mkdtemp(prefix="merge_slope_")
    try:
        for n in SCALES:
            for mode in ("whole", "bucketed"):
                path = os.path.join(work, f"{mode}_{n}")
                hist = sigs(0, n)
                src = batch
                kwargs = {}
                if mode == "bucketed":
                    bcol = F.pmod(F.xxhash64("doc_id"), F.lit(BUCKETS))
                    hist = hist.withColumn("bucket", bcol)
                    src = batch.withColumn("bucket", bcol)
                    kwargs["partition_by"] = ["bucket"]
                write_table(hist, path, partition_by=kwargs.get("partition_by", ()))
                best = None
                for _ in range(RUNS):
                    t0 = time.time()
                    upsert_table(spark, src, path, key="doc_id", **kwargs)
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                results[mode][n] = best
                print(f"{mode:9s} history {n:>9,d}: {best:6.2f}s", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print()
    for mode, times in results.items():
        for lo, hi in zip(SCALES, SCALES[1:]):
            slope = math.log(times[hi] / times[lo]) / math.log(hi / lo)
            print(f"{mode:9s} slope {lo:,}->{hi:,}: {slope:+.2f}")


if __name__ == "__main__":
    main()
