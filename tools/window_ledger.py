"""Driver-evidence ledger, computed from the on-disk CORRECTNESS files.

Round-11 lesson (VERDICT r11 "What's wrong" #1): the builder's mental
ledger credited the round-9 window, but no CORRECTNESS_r09 artifact
ever materialized (r08 re-ran the r07 window verbatim), so 38
oracle-backed queries were believed checked while having no driver row
at all. The only trustworthy ledger is the one recomputed from the
artifacts. This script is that ledger:

  python tools/window_ledger.py            # summary + never-checked list
  python tools/window_ledger.py --stale N  # N stalest ever-green queries
  python tools/window_ledger.py --changed REV..REV
      # queries whose code paths the git range touched, with their
      # in-window status — "changed code => driver window" as POLICY
      # (VERDICT r15 task #3): r15 rewrote streaming/ops.py write paths
      # but windowed only 5 of the 8 oracles crossing them; this mode
      # makes the omission visible instead of a judgment call.

"ever driver-green" = a row with rows_match true and no err in ANY
CORRECTNESS_r*.json. Use the output to draft the next _DRIVER_WINDOW
(nba_data_pipeline_spark/harness.py) — never a projection of what a
future window "will" cover; any --changed query NOT in the drafted
window needs a written reason in COVERAGE.md's rotation note.
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
PKG = "nba_data_pipeline_spark"


def _module_of(path: str) -> str | None:
    """Repo-relative .py path -> dotted module name inside the package."""
    if not path.endswith(".py") or not path.startswith(PKG + "/"):
        return None
    mod = path[:-3].replace("/", ".")
    return mod[:-9] if mod.endswith(".__init__") else mod


def _imports_of(tree: ast.AST, cur_mod: str) -> set[str]:
    """Package-internal modules a parsed tree imports (module-level AND
    function-local — the harness imports inside query bodies)."""
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against cur_mod
                base = cur_mod.split(".")[: -node.level]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if mod.startswith(PKG):
                out.add(mod)
                # `from .sinks import snapshot` names a MODULE in the
                # alias list; record those too
                for alias in node.names:
                    out.add(f"{mod}.{alias.name}")
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    out.add(alias.name)
    return out


def _import_graph() -> dict[str, set[str]]:
    """module -> package-internal modules it imports (direct)."""
    graph: dict[str, set[str]] = {}
    for path in glob.glob(os.path.join(ROOT, PKG, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, ROOT)
        mod = _module_of(rel)
        if mod is None:
            continue
        with open(path) as fh:
            tree = ast.parse(fh.read())
        graph[mod] = _imports_of(tree, mod)
    return graph


def _changed_harness_queries(rev_range: str) -> set[str]:
    """Query names whose @q-decorated function bodies the range touched
    (file-level attribution is useless for the 10k-line registry)."""
    diff = subprocess.run(
        ["git", "diff", "-U0", rev_range, "--", f"{PKG}/harness.py"],
        capture_output=True, text=True, cwd=ROOT, check=True,
    ).stdout
    new_lines: set[int] = set()
    for m in re.finditer(r"^@@ -\S+ \+(\d+)(?:,(\d+))? @@", diff, re.M):
        start, n = int(m.group(1)), int(m.group(2) or "1")
        new_lines.update(range(start, start + max(n, 1)))
    if not new_lines:
        return set()
    with open(os.path.join(ROOT, PKG, "harness.py")) as fh:
        tree = ast.parse(fh.read())
    from nba_data_pipeline_spark import harness

    by_fn = {fn.__name__: name for name, fn in harness.queries().items()}
    hit: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in by_fn:
            span = range(
                min(d.lineno for d in node.decorator_list or [node]),
                node.end_lineno + 1,
            )
            if new_lines & set(span):
                hit.add(by_fn[node.name])
    return hit


def changed_queries(rev_range: str) -> dict[str, list[str]]:
    """query name -> sorted list of touched modules that reach it."""
    files = subprocess.run(
        ["git", "diff", "--name-only", rev_range],
        capture_output=True, text=True, cwd=ROOT, check=True,
    ).stdout.split()
    touched = {m for f in files if (m := _module_of(f)) is not None}
    touched.discard(f"{PKG}.harness")  # handled at function granularity
    graph = _import_graph()

    from nba_data_pipeline_spark import harness

    with open(os.path.join(ROOT, PKG, "harness.py")) as fh:
        tree = ast.parse(fh.read())
    by_fn = {fn.__name__: name for name, fn in harness.queries().items()}
    fn_nodes = {
        n.name: n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in by_fn
    }
    module_prefix = f"{PKG}.harness"
    out: dict[str, list[str]] = {}
    for fn_name, node in fn_nodes.items():
        imports = _imports_of(node, module_prefix)
        hits = sorted({t for t in touched if _query_touches(imports, t, graph)})
        if hits:
            out[by_fn[fn_name]] = hits
    for qname in _changed_harness_queries(rev_range):
        out.setdefault(qname, []).append(f"{PKG}.harness (own body)")
    return out


def _reaches(graph: dict[str, set[str]], target: str, frm: str) -> set[str]:
    seen, stack = set(), [frm]
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        stack.extend(graph.get(cur, ()))
    return seen


def _query_touches(imports: set[str], touched_mod: str, graph) -> bool:
    """True iff any module the query imports reaches the touched one."""
    for imp in imports:
        if imp == touched_mod or touched_mod in _reaches(graph, touched_mod, imp):
            return True
    return False


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
    ap.add_argument(
        "--changed", metavar="REV..REV",
        help="map a git range to affected registry queries + window status",
    )
    args = ap.parse_args()

    if args.changed:
        from nba_data_pipeline_spark import harness

        window = set(harness._DRIVER_WINDOW)
        affected = changed_queries(args.changed)
        missing = [q for q in sorted(affected) if q not in window]
        print(f"queries whose code paths {args.changed} touched: {len(affected)}")
        for q in sorted(affected):
            mark = "IN-WINDOW " if q in window else "NOT-IN-WINDOW"
            print(f"  {mark} {q}  <- {', '.join(affected[q])}")
        print(f"\nchanged-path queries NOT in _DRIVER_WINDOW: {len(missing)}")
        print("(each needs a written reason in COVERAGE.md's rotation note)")
        return

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
