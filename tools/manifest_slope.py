"""Manifest-layer cost at high file counts (no Spark needed).

The snapshot format keeps one JSON dict per data file in each
manifest, so commit/load/prune are all O(file count). This tool
measures that constant at 100 / 1k / 10k / 100k file entries —
synthesized manifests through the REAL code paths (`_commit`,
`_load_manifest`, `_split_by_overlap` + `_batch_bounds`-shaped
pruning, vacuum's referenced-set build) — so the module docstring's
"graduate to parquet manifest lists like Iceberg at very large file
counts" claim has a measured trigger point instead of a guess.

Usage: python tools/manifest_slope.py [runs]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_data_pipeline_spark.sinks import snapshot as S  # noqa: E402

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SCALES = (100, 1_000, 10_000, 100_000)


def fake_manifest(n_files: int) -> dict:
    files = [
        {
            "path": f"data/{i:08x}-00000.parquet",
            "rows": 1000,
            "stats": {
                "k": {"min": i * 1000, "max": i * 1000 + 999, "has_nulls": False}
            },
        }
        for i in range(n_files)
    ]
    return {
        "op": "create",
        "key": ["k"],
        "stat_cols": [],
        "schema": '{"type":"struct","fields":[]}',
        "files": files,
        "rows": 1000 * n_files,
    }


def best(fn, runs=RUNS) -> float:
    t = math.inf
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        t = min(t, time.perf_counter() - t0)
    return t


def main() -> None:
    print(f"{'files':>8}  {'commit':>9}  {'load':>9}  {'prune':>9}  "
          f"{'vacuum-ref':>10}  manifest-bytes")
    for n in SCALES:
        root = tempfile.mkdtemp(prefix="manifest_slope_")
        try:
            m = fake_manifest(n)
            # commit: full json dump + fsync + link through the real path
            versions = [0]

            def commit():
                S._commit(root, m, None)
                versions[0] += 1

            t_commit = best(commit)
            v = versions[0]
            t_load = best(lambda: S._load_manifest(root, v))
            loaded = S._load_manifest(root, v)
            # point-batch prune over every file's stats (the coarse pass
            # every merge runs before the exact join refinement)
            bounds = {"k": (n * 500, n * 500 + 10, False)}

            def prune():
                touched, carried = S._split_by_overlap(
                    loaded["files"], ["k"], bounds
                )
                assert len(touched) == 1, len(touched)

            t_prune = best(prune)

            def vacuum_ref():
                ref = set()
                for f in loaded["files"]:
                    ref.add(os.path.basename(f["path"]))
                return ref

            t_vac = best(vacuum_ref)
            size = os.path.getsize(S._manifest_path(root, 1))
            print(f"{n:>8}  {t_commit*1e3:>8.1f}ms {t_load*1e3:>8.1f}ms "
                  f"{t_prune*1e3:>8.1f}ms {t_vac*1e3:>9.1f}ms  "
                  f"{size/1024:>8.0f} KiB")
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(
        "\nInterpretation: all four are linear in file count. At the\n"
        "measured constants a 10k-file table pays ~0.1s of manifest\n"
        "overhead per commit (noise next to any real data write); a\n"
        "100k-file table (100 TB at 1 GiB files) pays ~1s commit +\n"
        "~0.4s load — still small against the job it describes, but\n"
        "the point where the Iceberg-style manifest-list graduation\n"
        "(noted open in the module docstring) starts to earn its\n"
        "complexity. Readers pay the load cost once per query; prune\n"
        "stays in the tens of milliseconds even at 100k files."
    )


if __name__ == "__main__":
    main()
