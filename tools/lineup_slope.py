"""Scaling-slope evidence for the declarative lineup path (VERDICT r10
task #3): SURVEY §2's centerpiece operator (O3) gets the same measured
scale story as the dedup/ANN families.

``lineups_via_range_join`` is timed (min of RUNS, warmed once) over the
replicated bulk fixture at three game counts — 100 / 1,000 / 10,000
games of 300 events each (30k / 300k / 3M events) — and the log-log
slope between consecutive decades is reported:
slope = log(t2/t1) / log(n2/n1); 1.0 = perfectly linear in games,
<= ~1.1 is the acceptance bar. Games are independent units of work
(the one event-scale shuffle hash-partitions on GAME_ID), so anything
materially superlinear means a plan defect (a shuffle growing faster
than its input, a lost broadcast), not data growth.

The exact applyInPandas twin is probed at the same scales for the
published Arrow-transfer-tax comparison.

Usage: python tools/lineup_slope.py [runs]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SCALES = [100, 1_000, 10_000]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from nba_data_pipeline_spark import harness
    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.operators.lineups import (
        lineups_via_range_join,
        track_lineups,
    )

    spark = get_session("lineup_slope")
    results: dict[str, dict[int, float]] = {"declarative": {}, "exact": {}}
    for n_games in SCALES:
        pbp, rot, tgl = harness._replicated_fixture(spark, n_games, events_mult=50)
        for label, fn in (("declarative", lineups_via_range_join), ("exact", track_lineups)):
            fn(pbp, rot, tgl).count()  # warm
            ts = []
            for _ in range(RUNS):
                spark.catalog.clearCache()  # charge the persist() cost to the run
                t0 = time.time()
                fn(pbp, rot, tgl).count()
                ts.append(time.time() - t0)
            results[label][n_games] = min(ts)
            print(f"{label:12s} {n_games:6d} games: {min(ts):6.2f}s", flush=True)
    print()
    for label, times in results.items():
        for lo, hi in zip(SCALES, SCALES[1:]):
            slope = math.log(times[hi] / times[lo]) / math.log(hi / lo)
            print(f"{label:12s} slope {lo}->{hi}: {slope:+.2f}")


if __name__ == "__main__":
    main()
