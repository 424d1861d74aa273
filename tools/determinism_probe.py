"""Registry-wide determinism probe.

The arbitrary-survivor bug class (a row_number over an under-specified
ordering, a first() without sort, a max_by with ties) produces results
that flip with physical layout — invisible to a single-run oracle check
because BOTH engines see one arbitrary-but-stable answer per session.
Round-7 spot probes caught two such classes (table_diff, fuzzy_join);
this tool mechanizes the probe across the ENTIRE registry: run every
query in TWO separate Spark sessions with different shuffle-partition
counts and default parallelism, value-hash each result exactly like the
driver's correctness gate, and report any query whose hash moves.

Engine-hash queries (xxhash64 LSH and friends) are deterministic too —
hash functions are pure — so everything registered is eligible; queries
whose OUTPUT is legitimately layout-dependent must not exist in this
registry (survivor rules are tie-broken by id everywhere).

Usage: python tools/determinism_probe.py [sf_dir] [name...]
       (default sf dir: /root/testdata/sf0.001 — determinism bugs are
       layout bugs, small data flips them just as well)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (bytes, bytearray)):
        return hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, list):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return len(rows), h.hexdigest()


def one_pass(shuffle_parts: str, cpus: str, names):
    os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = shuffle_parts
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from nba_data_pipeline_spark.core.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(f"determinism-{shuffle_parts}")
    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            out[name] = table_hash(df.collect(), df.columns)
            status = "ok"
        except Exception as exc:  # noqa: BLE001
            out[name] = ("ERR", f"{type(exc).__name__}: {exc}"[:200])
            status = "ERR"
        print(
            f"# pass[{shuffle_parts}] {name}: {status} ({time.time()-t0:.1f}s)",
            file=sys.stderr, flush=True,
        )
    spark.stop()
    return out


def main() -> None:
    import __spark_entry__ as entrymod

    names = [n for n in entrymod.queries() if not ONLY or n in ONLY]
    a = one_pass("7", "8", names)
    b = one_pass("13", "8", names)
    bad, errs = [], []
    for n in names:
        if a[n][0] == "ERR" or b[n][0] == "ERR":
            errs.append((n, a[n], b[n]))
        elif a[n] != b[n]:
            bad.append((n, a[n], b[n]))
    for n, ha, hb in bad:
        print(f"NONDETERMINISTIC {n}: {ha} vs {hb}")
    for n, ha, hb in errs:
        print(f"ERROR {n}: {ha} / {hb}")
    print(f"\n{len(names)} queries, {len(bad)} layout-dependent, {len(errs)} errors")
    if bad or errs:
        sys.exit(1)
    print("all queries layout-independent across shuffle-partition settings")


if __name__ == "__main__":
    main()
