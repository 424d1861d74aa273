"""Merge-cost comparison: manifest-committed snapshot tables
(sinks/snapshot.py) vs the swap-protocol state tables
(sinks/writer.py upsert_table) under the same workload.

The 100-TB claim for the snapshot format is that a small merge costs
O(touched files + batch), independent of table size: exact file
pruning carries untouched files by reference and the commit is one
link(2). This tool MEASURES that against the bucketed swap protocol —
a FIXED 200-key batch (keys clustered in one narrow range, the
point-merge shape) upserted into tables of 1x / 10x / 100x rows:

  1x     50,000 rows
  10x   500,000 rows
  100x 5,000,000 rows

reporting per-scale wall time, the touched/total file ratio, and the
log-log slope between consecutive decades. Snapshot tables are
created key-sorted (disjoint file ranges), so the clustered batch
should pin touched-file count ~constant while the swap table's cost
tracks its touched-bucket volume. A second batch shape — 200 keys
SPREAD uniformly across the keyspace — shows the honest worst case:
spread keys touch every file and the snapshot merge degrades to the
full-rewrite cost, which is the workload bucketing handles better.

Usage: python tools/snapshot_slope.py [runs]
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
SCALES = (50_000, 500_000, 5_000_000)
FILES_PER_TABLE = 16
BUCKETS = 16  # swap-table contrast uses the same fan-out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.sinks import snapshot as S
    from nba_data_pipeline_spark.sinks.writer import upsert_table

    spark = get_session("snapshot_slope")

    def table(n_rows: int):
        return spark.range(n_rows).select(
            F.col("id").alias("k"), (F.col("id") % 997).cast("double").alias("v")
        )

    def batch(n_rows: int, spread: bool):
        if spread:
            ids = spark.range(200).select(
                (F.col("id") * (n_rows // 200)).alias("k")
            )
        else:
            ids = spark.range(200).select((F.col("id") + n_rows // 2).alias("k"))
        return ids.select("k", F.lit(-1.0).alias("v"))

    results: dict[tuple[str, bool, int], float] = {}
    touched: dict[tuple[bool, int], str] = {}
    cdf_times: dict[tuple[bool, int], float] = {}
    for n in SCALES:
        for spread in (False, True):
            # --- snapshot format ---
            best = math.inf
            for _ in range(RUNS):
                root = tempfile.mkdtemp(prefix="snapslope_")
                try:
                    df = table(n).repartitionByRange(FILES_PER_TABLE, "k")
                    S.write_snapshot(spark, df, root, key="k")
                    b = batch(n, spread).localCheckpoint()
                    t0 = time.time()
                    S.upsert_snapshot(spark, b, root, "k")
                    best = min(best, time.time() - t0)
                    m1 = S._load_manifest(root, 1)
                    m2 = S._load_manifest(root, 2)
                    v1 = {f["path"] for f in m1["files"]}
                    carried = sum(1 for f in m2["files"] if f["path"] in v1)
                    touched[(spread, n)] = (
                        f"{len(m1['files']) - carried}/{len(m1['files'])}"
                    )
                    # CDF cost: O(changed files) claim — reads only the
                    # files the merge added/removed, never the carried set
                    t0 = time.time()
                    S.snapshot_changes(spark, root, 1).count()
                    cdf_times[(spread, n)] = min(
                        cdf_times.get((spread, n), math.inf), time.time() - t0
                    )
                finally:
                    shutil.rmtree(root, ignore_errors=True)
            results[("snapshot", spread, n)] = best
            # --- swap-protocol contrast ---
            best = math.inf
            for _ in range(RUNS):
                root = tempfile.mkdtemp(prefix="swapslope_")
                try:
                    path = os.path.join(root, "t")
                    df = table(n).withColumn(
                        "bucket", F.pmod(F.xxhash64("k"), F.lit(BUCKETS))
                    )
                    upsert_table(spark, df, path, "k", partition_by=["bucket"],
                                 buckets=BUCKETS)
                    b = batch(n, spread).withColumn(
                        "bucket", F.pmod(F.xxhash64("k"), F.lit(BUCKETS))
                    ).localCheckpoint()
                    t0 = time.time()
                    upsert_table(spark, b, path, "k", partition_by=["bucket"],
                                 buckets=BUCKETS)
                    best = min(best, time.time() - t0)
                finally:
                    shutil.rmtree(root, ignore_errors=True)
            results[("swap", spread, n)] = best

    print(f"\n{'fmt':10} {'batch':8} " + " ".join(f"{n:>12,}" for n in SCALES)
          + "   slope(last decade)")
    for fmt in ("snapshot", "swap"):
        for spread in (False, True):
            row = [results[(fmt, spread, n)] for n in SCALES]
            slope = math.log(row[-1] / row[-2]) / math.log(10)
            shape = "spread" if spread else "point"
            print(f"{fmt:10} {shape:8} "
                  + " ".join(f"{t:>11.2f}s" for t in row)
                  + f"   {slope:+.2f}")
    print("\nsnapshot touched/total files per scale:")
    for spread in (False, True):
        shape = "spread" if spread else "point"
        print(f"  {shape:8} "
              + " ".join(f"{touched[(spread, n)]:>12}" for n in SCALES))
    print("\nsnapshot_changes(v1 -> v2) floors (reads only changed files):")
    for spread in (False, True):
        shape = "spread" if spread else "point"
        print(f"  {shape:8} "
              + " ".join(f"{cdf_times[(spread, n)]:>11.2f}s" for n in SCALES))


if __name__ == "__main__":
    main()
