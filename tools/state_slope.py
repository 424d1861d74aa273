"""Flatness evidence for the bucket-partitioned persisted fold
(round 10, `operators/incremental.py fold_aggregate_state_table`).

The 100-TB claim is that folding a batch into a persisted rollup costs
O(batch + touched-bucket rows), not O(state): the state table is laid
out in `pmod(xxhash64(keys), n_buckets)` partition dirs and a batch
only reads/rewrites the dirs its keys hash into. This tool MEASURES
that: a FIXED 1,000-row / 100-key batch is folded into state built
from 1x / 10x / 100x synthetic key populations —

  1x     50,000 keys
  10x   500,000 keys
  100x 5,000,000 keys

with n_buckets=256, and reports the log-log slope between consecutive
scales. With 100 distinct batch keys, ~100 of 256 buckets are touched
at every scale, so the touched fraction is constant and the only
growth is the rows inside those buckets (~linear in state size /
n_buckets). Expected: sublinear wall-time growth, slope well under
1.0 at the top decade (the contrast row, a whole-state rewrite via the
in-memory fold + full write, is ~1.0 by construction).

Usage: python tools/state_slope.py [runs]
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


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.operators.incremental import (
        fold_aggregate_state,
        fold_aggregate_state_table,
    )
    from nba_data_pipeline_spark.sinks.writer import write_table

    spark = get_session("state_slope")
    specs = {"n": ("count", "*"), "s": ("sum", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")}

    def keyspace(n_keys: int):
        return spark.range(n_keys).select(
            F.col("id").alias("k"), (F.col("id") % 997).cast("double").alias("v")
        )

    # fixed trickle: 1,000 rows over 100 distinct keys
    batch = spark.range(1000).select(
        (F.col("id") % 100).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    ).localCheckpoint()

    warmed = False
    rows = []
    for mult in (1, 10, 100):
        n_keys = 50_000 * mult
        work = tempfile.mkdtemp(prefix=f"stateslope_{mult}x_")
        bucketed_p = os.path.join(work, "bucketed")
        flat_p = os.path.join(work, "flat")
        # bootstrap both state layouts from the full key population
        # (build cost is amortized history, not the thing under test)
        fold_aggregate_state_table(
            spark, keyspace(n_keys), bucketed_p, ["k"], specs, n_buckets=256
        )
        write_table(
            fold_aggregate_state(None, keyspace(n_keys), ["k"], specs), flat_p
        )

        def fold_bucketed():
            fold_aggregate_state_table(
                spark, batch, bucketed_p, ["k"], specs, n_buckets=256
            )

        def fold_flat():
            merged = fold_aggregate_state(
                spark.read.parquet(flat_p), batch, ["k"], specs
            ).localCheckpoint()
            write_table(merged, flat_p)

        if not warmed:
            fold_bucketed()
            fold_flat()
            warmed = True

        best_b = min(_timed(fold_bucketed) for _ in range(RUNS))
        best_f = min(_timed(fold_flat) for _ in range(RUNS))
        rows.append((mult, n_keys, best_b, best_f))
        print(
            f"state {mult:>3}x ({n_keys:>9,} keys): "
            f"bucketed_fold {best_b:6.2f}s   whole-state_fold {best_f:6.2f}s",
            flush=True,
        )
        shutil.rmtree(work)

    print("\nslopes (log t-ratio / log n-ratio; flat = 0.0):")
    for (m1, n1, b1, f1), (m2, n2, b2, f2) in zip(rows, rows[1:]):
        sb = math.log(b2 / b1) / math.log(n2 / n1)
        sf_ = math.log(f2 / f1) / math.log(n2 / n1)
        print(
            f"  {m1}x -> {m2}x: bucketed slope {sb:+.2f}   "
            f"whole-state slope {sf_:+.2f}"
        )


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


if __name__ == "__main__":
    main()
