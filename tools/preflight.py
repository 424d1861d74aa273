"""Pre-hand-off multi-scale correctness sweep (the committed form of the
discipline that kept round 6 zero-red).

Runs, in one process:
  1. the FULL oracle-backed registry at sf0.001 (fast smoke at a scale
     where off-by-one / empty-input bugs surface),
  2. the FULL registry again at sf0.01 (the driver's gate scale),
  3. the 50-query driver window at sf0.1 (FP-accumulation scale — the
     window is what the driver actually hashes, so it gets the extra
     scale point).

Exits nonzero on ANY mismatch at any scale. Usage:

    python tools/preflight.py            # all three stages
    python tools/preflight.py --fast     # stage 2 only (driver scale)

Each stage shells out to tools/check_oracle.py so the comparison logic
(type-parity gate, value hash, row diff) stays in exactly one file.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECK = os.path.join(REPO, "tools", "check_oracle.py")


def window_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    return list(entrymod.queries())[:50]


def run_stage(label: str, sf_dir: str, names: list[str] | None) -> bool:
    t0 = time.time()
    cmd = [sys.executable, CHECK, sf_dir] + (names or [])
    print(f"== preflight stage: {label} ({sf_dir}, "
          f"{len(names) if names else 'ALL'} queries) ==", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    ok = proc.returncode == 0
    print(f"== {label}: {'PASS' if ok else 'FAIL'} in {time.time()-t0:.0f}s ==",
          flush=True)
    return ok


def main() -> None:
    fast = "--fast" in sys.argv
    stages: list[tuple[str, str, list[str] | None]] = []
    if not fast:
        stages.append(("full registry @ sf0.001", "/root/testdata/sf0.001", None))
    stages.append(("full registry @ sf0.01 (driver scale)", "/root/testdata/sf0.01", None))
    if not fast:
        stages.append(("driver window @ sf0.1", "/root/testdata/sf0.1", window_names()))
    failed = [label for label, sf, names in stages if not run_stage(label, sf, names)]
    if failed:
        print(f"\nPREFLIGHT FAILED: {failed}")
        sys.exit(1)
    print("\nPREFLIGHT GREEN: all stages passed")


if __name__ == "__main__":
    main()
