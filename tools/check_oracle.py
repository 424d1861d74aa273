"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry at the given sf dir, runs
the matching oracle_sql() in DuckDB over the same parquet, and
compares row count, sorted column names, and an order-insensitive
value hash. Usage: python tools/check_oracle.py [sf_dir] [name...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _duck_family(t):
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
             "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL") or t == "HUGEINT":
        # fetchall() happens to return Python ints/Decimals that may
        # still hash equal locally, but the driver's fetch path (pandas/
        # arrow) maps these to float64/decimal128 — not engine-portable.
        return "NONPORTABLE:" + t
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "NONPORTABLE:" + t  # harness rule: timestamps leave as unix micros
    return t.lower()


def _spark_family(dt):
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "NONPORTABLE:" + s
    if s == "boolean":
        return "bool"
    if s == "string":
        return "str"
    if s.startswith("timestamp") or s == "date":
        return "NONPORTABLE:" + s
    return s


def type_parity_problems(sdf, rel):
    """Driver-parity gate: the driver's hash normalization is unknown, so
    the only safe contract is bit-identical Python types on both sides.
    Flags (a) any DuckDB/Spark type-family divergence per column and
    (b) families whose Python representation depends on the fetch path
    (HUGEINT, DECIMAL, raw timestamps)."""
    sfam = {f.name: _spark_family(f.dataType) for f in sdf.schema.fields}
    dfam = dict(zip(rel.columns, (_duck_family(t) for t in rel.types)))
    problems = []
    for col in sorted(set(sfam) & set(dfam)):
        a, b = sfam[col], dfam[col]
        if a != b or a.startswith("NONPORTABLE") or b.startswith("NONPORTABLE"):
            problems.append(f"type[{col}] spark={a} duck={b}")
    return problems


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    from nba_data_pipeline_spark.core.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("oracle_check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(exc)[:300]}")
            continue
        problems = type_parity_problems(sdf, rel)
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems and table_hash(srows, scols) != table_hash(drows, dcols):
            problems.append("value hash mismatch")
            seen = {}
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = {}
            for r in srows:
                key = "|".join(norm_value(r[i]) for i in order_s)
                sset[key] = sset.get(key, 0) + 1
            for r in drows:
                key = "|".join(norm_value(r[i]) for i in order_d)
                if sset.get(key):
                    sset[key] -= 1
                else:
                    seen[key] = seen.get(key, 0) + 1
            extra_s = [k for k, c in sset.items() if c > 0][:3]
            extra_d = list(seen.keys())[:3]
            problems.append(f"spark-only={extra_s} duck-only={extra_d}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
