"""Driver-evidence ledger, computed from the on-disk CORRECTNESS files.

Round-11 lesson (VERDICT r11 "What's wrong" #1): the builder's mental
ledger credited the round-9 window, but no CORRECTNESS_r09 artifact
ever materialized (r08 re-ran the r07 window verbatim), so 38
oracle-backed queries were believed checked while having no driver row
at all. The only trustworthy ledger is the one recomputed from the
artifacts. This script is that ledger:

  python tools/window_ledger.py            # summary + never-checked list
  python tools/window_ledger.py --stale N  # N stalest ever-green queries

"ever driver-green" = a row with rows_match true and no err in ANY
CORRECTNESS_r*.json. Use the output to draft the next _DRIVER_WINDOW
(nba_data_pipeline_spark/harness.py) — never a projection of what a
future window "will" cover.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def ledger() -> tuple[dict[str, list[int]], list[str], dict[str, int]]:
    """Return (ever_green: name -> rounds, never_checked oracle-backed
    names sorted, last_green: name -> latest round)."""
    checked: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and not row.get("err"):
                checked.setdefault(name, []).append(rnd)

    import __spark_entry__ as entry

    oracles = set(entry.oracle_sql())
    never = sorted(oracles - set(checked))
    last = {n: max(r) for n, r in checked.items()}
    return checked, never, last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale", type=int, default=10)
    args = ap.parse_args()

    checked, never, last = ledger()

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    print(f"registry: {len(qs)} queries / {len(oracles)} oracles / "
          f"{len(set(qs) - set(oracles))} rows-only")
    print(f"ever driver-green: {len(checked)}")
    print(f"never-driver-checked oracle-backed: {len(never)}")
    for name in never:
        print(f"  {name}")
    stale = sorted(last.items(), key=lambda kv: (kv[1], kv[0]))[: args.stale]
    print(f"stalest {args.stale} greens (name, last-green round):")
    for name, rnd in stale:
        print(f"  {name}  r{rnd}")


if __name__ == "__main__":
    main()
