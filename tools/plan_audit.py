"""Physical-plan audit: one table row per headline query -> PLANS.md.

Complements tests/test_plan_shapes.py (which PINS individual
properties): this tool surveys the WHOLE headline set mechanically so
a reviewer can see, per query, the properties the 100 TB story rests
on — how many parquet scans and shuffles the plan carries, whether
filters reached the scan, what got broadcast, and whether any Python
boundary (pandas UDF / mapInPandas) sits in the hot path. Run after
plan-affecting changes:

    python tools/plan_audit.py            # writes PLANS.md at repo root
    python tools/plan_audit.py name...    # audit a subset, print only
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def strip_cached_subplans(plan: str) -> str:
    """Drop InMemoryRelation inner plans and AQE '== Initial Plan =='
    sections from a plan string. A query over a materialized cache
    (e.g. the declarative lineup path's persisted event frame) embeds
    the cached plan — final AND initial — once per InMemoryTableScan
    reference; counting those would charge the query for shuffles that
    ran once at cache build, multiplied by reference count."""
    out: list[str] = []
    cut: int | None = None
    for line in plan.splitlines():
        body = line.replace(":", " ").replace("+-", "  ")
        indent = len(body) - len(body.lstrip())
        if cut is not None:
            if line.strip() and indent > cut:
                continue
            cut = None
        if "InMemoryRelation" in line or "== Initial Plan ==" in line:
            cut = indent
            continue
        out.append(line)
    return "\n".join(out)


def audit_plan(plan: str) -> dict[str, object]:
    plan = strip_cached_subplans(plan)
    scans = plan.count("Scan parquet")
    exchanges = len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))
    broadcasts = plan.count("BroadcastExchange")
    python_nodes = sum(
        plan.count(n)
        for n in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
                  "FlatMapCoGroupsInPandas", "MapInPandas")
    )
    sorts = plan.count("Sort [")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed for f in p.split(",") if f.strip())
    return {
        "scans": scans,
        "exchanges": exchanges,
        "broadcasts": broadcasts,
        "sorts": sorts,
        "python": python_nodes,
        "pushed_filters": n_pushed,
        "cartesian": "CartesianProduct" in plan,
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
    }


# queries whose plan LEGITIMATELY carries a Python boundary or a
# CartesianProduct — each is a documented, intentional kernel, and the
# full-registry sweep flags any query outside this list
PYTHON_OK = {
    # the one retained pandas-UDF kernel + its crossover baselines
    "lineup_tracking", "lineup_tracking_bulk", "lineup_validation",
    # streaming replay-parity harness drives foreachBatch in-process
    "streaming_replay_parity",
    # the multimodal/codec family: image/audio/video decode and zlib
    # compression are Arrow-batched mapInPandas kernels BY DESIGN —
    # byte-level codecs have no JVM-side expression in a stdlib-only
    # sandbox, and the Python boundary is the documented slow path
    # (SURVEY §2 multimodal; operators/multimodal.py module docstring).
    # Everything around the kernel (schema, partitioning, aggregation)
    # stays declarative, which is what the other columns verify.
    "image_resize", "image_features", "image_channel_stats",
    "image_dhash_pairs", "frame_samples", "augment_gate",
    "audio_windows", "audio_ahash_pairs", "audio_pipeline_gate",
    "media_pipeline_gate", "mjpeg_codec_gate", "video_frame_overlap",
    "compression_ratio",
    # rerank stage applies the (pluggable) scorer as a pandas UDF over
    # the tiny candidate set — O(queries x k), never corpus-scale
    "rerank_topk",
}
CARTESIAN_OK = {
    # documented brute-force ANN baseline (similarity.py crossJoin)
    "cosine_topk",
}
SCAN_EXPLOSION = 14  # tpch_q2's correlated regional-min shape is 12


def _audit_names(spark, qs, names: list[str]) -> list[tuple[str, dict]]:
    rows = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((name, audit_plan(plan)))
        except Exception as e:  # noqa: BLE001 - survey must not die mid-list
            rows.append((name, {"error": str(e).splitlines()[0][:80]}))
    return rows


def _table(rows: list[tuple[str, dict]]) -> str:
    header = (
        "| query | scans | shuffles | broadcasts | sorts | python | pushed | bnlj | cartesian |\n"
        "|---|---|---|---|---|---|---|---|---|\n"
    )
    lines = []
    for name, a in rows:
        if "error" in a:
            lines.append(f"| {name} | ERROR: {a['error']} |")
            continue
        lines.append(
            f"| {name} | {a['scans']} | {a['exchanges']} | {a['broadcasts']} | "
            f"{a['sorts']} | {a['python']} | {a['pushed_filters']} | "
            f"{a['bnlj'] or '-'} | {'YES' if a['cartesian'] else '-'} |"
        )
    return header + "\n".join(lines)


def _flags(rows: list[tuple[str, dict]]) -> list[str]:
    """Scale anti-patterns the sweep exists to catch — anything listed
    here is a defect to fix or allowlist with a documented reason."""
    out = []
    for name, a in rows:
        if "error" in a:
            out.append(f"{name}: ERROR {a['error']}")
            continue
        if a["cartesian"] and name not in CARTESIAN_OK:
            out.append(f"{name}: CartesianProduct")
        if a["python"] and name not in PYTHON_OK:
            out.append(f"{name}: {a['python']} python boundary node(s)")
        if a["scans"] > SCAN_EXPLOSION:
            out.append(f"{name}: scan explosion ({a['scans']} parquet scans)")
    return out


def parse_plans_table(path: str) -> dict[str, dict[str, int]]:
    """Parse the query rows out of a PLANS.md (both tables). Returns
    {name: {scans, shuffles, broadcasts, sorts, python, pushed}}."""
    rows: dict[str, dict[str, int]] = {}
    for line in open(path):
        if not line.startswith("| ") or line.startswith("| query") or line.startswith("|---"):
            continue
        parts = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(parts) != 9 or parts[1].startswith("ERROR"):
            continue
        try:
            rows[parts[0]] = {
                "scans": int(parts[1]),
                "shuffles": int(parts[2]),
                "broadcasts": int(parts[3]),
                "sorts": int(parts[4]),
                "python": int(parts[5]),
                "pushed": int(parts[6]),
                "cartesian": parts[8] == "YES",
            }
        except ValueError:
            continue
    return rows


def diff_plans(prev_path: str, new_path: str) -> list[str]:
    """Plan-shape regression diff (VERDICT r12 task #7): flag any query
    whose scans/shuffles/python counts GREW vs the prior round's
    PLANS.md — the mechanical catch for localCheckpoint-class
    regressions (a dropped cache/checkpoint multiplies scans, an
    accidental repartition adds a shuffle, a new UDF adds a python
    boundary). Broadcast/sort growth is informational only (AQE
    legitimately flips join strategies at different stats)."""
    prev, new = parse_plans_table(prev_path), parse_plans_table(new_path)
    flags: list[str] = []
    grew = ("scans", "shuffles", "python")
    for name in sorted(set(prev) & set(new)):
        deltas = [
            f"{k} {prev[name][k]}->{new[name][k]}"
            for k in grew
            if new[name][k] > prev[name][k]
        ]
        if deltas:
            flags.append(f"{name}: " + ", ".join(deltas))
        if new[name]["cartesian"] and not prev[name]["cartesian"]:
            flags.append(f"{name}: gained CartesianProduct")
        if new[name]["pushed"] < prev[name]["pushed"]:
            flags.append(
                f"{name}: pushed filters {prev[name]['pushed']}->{new[name]['pushed']}"
            )
    removed = sorted(set(prev) - set(new))
    added = sorted(set(new) - set(prev))
    if removed:
        flags.append(f"removed queries: {', '.join(removed)}")
    if added:
        # informational — new queries have no baseline to regress from
        print(f"note: new queries (no baseline): {', '.join(added)}")
    return flags


def main() -> None:
    if "--diff" in sys.argv:
        i = sys.argv.index("--diff")
        prev_path = sys.argv[i + 1]
        new_path = sys.argv[i + 2] if len(sys.argv) > i + 2 else os.path.join(REPO, "PLANS.md")
        flags = diff_plans(prev_path, new_path)
        if flags:
            for f in flags:
                print(f"DIFF FLAG: {f}")
            sys.exit(1)
        print(f"plan diff clean: no scan/shuffle/python growth vs {prev_path}")
        return
    only = set(a for a in sys.argv[1:] if a != "--headline-only")
    headline_only = "--headline-only" in sys.argv
    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark import harness
    import bench

    spark = get_session("plan_audit")
    qs = harness.queries()
    # subset mode searches the WHOLE registry, not just the headline
    names = (
        [n for n in qs if n in only] if only else list(bench.HEADLINE)
    )
    rows = _audit_names(spark, qs, names)
    table = _table(rows)

    # full-registry sweep (VERDICT r11 task #7): every registered
    # query, not just the headline — the graph/sketch/PII families'
    # plans get the same mechanical cartesian/python/scan-explosion
    # check the headline always had
    full_rows: list[tuple[str, dict]] = []
    if not only and not headline_only:
        rest = [n for n in qs if n not in set(names)]
        full_rows = _audit_names(spark, qs, rest)
    all_rows = rows + full_rows
    flags = _flags(all_rows)
    flags_md = (
        "\n".join(f"- **{f}**" for f in flags) if flags else "- none — clean sweep"
    )

    doc = f"""# PLANS — physical-plan audit of the bench headline set

Generated by `tools/plan_audit.py` at sf dir `{SF_DIR}`
({time.strftime('%Y-%m-%d %H:%M:%S')}). Columns:

- **scans**: parquet FileScans in the executed plan (a melt/unpivot or
  multi-branch query that rescans its input shows up here),
- **shuffles**: Exchange nodes (hash/range/single-partition) — each is
  a full network shuffle at cluster scale,
- **broadcasts**: BroadcastExchange nodes (small sides shipped to every
  executor instead of shuffling the big side),
- **sorts**: Sort operators (window/sort-merge-join partials included),
- **python**: Arrow/pandas UDF boundary nodes — rows crossing the
  JVM<->Python boundary (only the four justified kernels should ever
  show nonzero here; codegen spans are not reported — AQE's lazy plan
  string hides WholeStageCodegen ids until stage finalization),
- **pushed**: predicates that reached the parquet reader,
- **bnlj**: BroadcastNestedLoopJoin count — legitimate ONLY when the
  broadcast side is bounded-tiny (a bucket list, a 1-row constant, a
  benchmark gram set); every occurrence in this table is one of those,
- **cartesian**: YES flags a true CartesianProduct (unbounded
  all-pairs) — must stay `-` for every query, every round.

Caveats: counts come from the sf-local plan — AQE may coalesce or
convert joins differently at other scales; `lineup_tracking_bulk`
intentionally shows a python node (it IS the applyInPandas
crossover baseline).

## Flags (full-registry anti-pattern sweep)

Cartesian products outside the documented brute-force baseline, Python
boundary nodes outside the four justified kernels, scan explosions
(> {SCAN_EXPLOSION} parquet scans):

{flags_md}

## Headline set

{table}
"""
    if full_rows:
        doc += f"""
## Full registry ({len(full_rows)} non-headline queries)

Same columns; fixture-based gates (lineup fixture, replicated-game
slopes) scan zero parquet tables by design.

{_table(full_rows)}
"""
    if only:
        print(doc)
    else:
        with open(os.path.join(REPO, "PLANS.md"), "w") as f:
            f.write(doc)
        print(f"wrote PLANS.md ({len(all_rows)} queries, {len(flags)} flags)")
        for f in flags:
            print(f"FLAG: {f}")


if __name__ == "__main__":
    main()
