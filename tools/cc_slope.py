"""Incremental vs from-scratch component maintenance, measured.

Fixed 200-edge ingest batch against a growing converged labeling:
from-scratch connected_components(old ∪ batch) re-propagates the whole
graph per batch (O(corpus) joins per round), incremental_components
touches the batch, the label lookup, and the condensed supernode graph
(O(batch)). The slope over history size is the datum: flat-ish for the
incremental path, growing for the recompute.

    python tools/cc_slope.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    spark = get_session("cc_slope")
    print("history_edges  full_s  incr_s  (min of 2)")
    for n in (30_000, 100_000, 300_000):
        # chain-of-stars graph: 1k-node components linked sparsely —
        # realistic dedup-cluster shape (many small components)
        old = spark.range(n).select(
            (F.col("id") - F.col("id") % 50).alias("id_a"),
            F.col("id").alias("id_b"),
        ).filter(F.col("id_a") != F.col("id_b"))
        labels = connected_components(old).localCheckpoint()
        labels.count()
        batch = spark.range(200).select(
            (F.col("id") * 997 % n).alias("id_a"),
            (F.lit(n) + F.col("id")).alias("id_b"),
        )
        full_t = incr_t = None
        for _ in range(2):
            t0 = time.time()
            connected_components(old.unionByName(batch)).count()
            dt = time.time() - t0
            full_t = dt if full_t is None else min(full_t, dt)
            t0 = time.time()
            incremental_components(labels, batch).count()
            dt = time.time() - t0
            incr_t = dt if incr_t is None else min(incr_t, dt)
        print(f"{n:>13}  {full_t:6.2f}  {incr_t:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
