"""Per-query isolated floors for a SUBSET of bench queries.

Same methodology as bench.py's floor phase (fresh session per query,
one untimed warm run, min-of-3 timed .count() runs) so numbers are
directly comparable to BENCH_full.json floors. Usage:

    python tools/floor_subset.py name [name...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/floor_subset.py winnow_pairs

Prints one line per query and a final JSON dict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_FLOOR_RUNS", "3"))


def main() -> None:
    from nba_data_pipeline_spark import harness
    from nba_data_pipeline_spark.core.session import get_session

    names = sys.argv[1:]
    qs = harness.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark = get_session("floor-subset")
        try:
            fn(spark, SF_DIR).count()  # warm (untimed)
            best = None
            for _ in range(RUNS):
                t0 = time.time()
                fn(spark, SF_DIR).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            print(f"# floor {name}: {out[name]}s", file=sys.stderr)
        finally:
            spark.stop()
            time.sleep(1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
