"""Cross-round floor comparison (VERDICT r10 task #6).

Reads two benchmark artifacts — BENCH_r{N}.json files as the driver
writes them (the JSON line may be embedded, truncated, in a `tail`
field) or a raw `bench.py` output line — extracts the per-query
isolated FLOORS (fresh-session min-of-3; falls back to the in-session
`queries` map when a file predates floors), and prints the
floor-vs-floor table with ratios.

Flagging: >25% slower is marked `SLOWER`, >25% faster `faster`.
Known-noise caveat printed with the table: byte-identical code has
measured +-39% drift on sub-second fixed-cost-dominated queries in
this environment (COVERAGE.md r10), so a sub-second SLOWER row is
noise unless the plan changed (tools/plan_audit.py settles that).

Basis guard (VERDICT r14 task #6): artifacts stamped with a `basis`
field ("idle-floors-min-of-3" vs "unattended-..." vs
"in-session-single-run") only compare when the bases match — a driver
overwrite of BENCH_full must not masquerade as idle floors. Pass
--force to compare anyway (the mismatch is still printed).

Usage:
    python tools/bench_diff.py BENCH_r10.json BENCH_r11.json
    python tools/bench_diff.py BENCH_r10.json /tmp/bench_local.out [--force]
"""

from __future__ import annotations

import json
import re
import sys


def _extract_map(text: str, key: str) -> dict[str, float] | None:
    m = re.search(r'"%s":\s*\{([^}]*)\}' % key, text)
    if not m:
        return None
    out: dict[str, float] = {}
    for name, val in re.findall(r'"([^"]+)":\s*([0-9.eE+-]+)', m.group(1)):
        out[name] = float(val)
    return out or None


def load_floors(path: str) -> tuple[str, dict[str, float]]:
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = {"tail": raw}
    if isinstance(doc, dict):
        parsed = doc.get("parsed")
        if isinstance(parsed, dict):
            for key in ("floors", "queries"):
                if isinstance(parsed.get(key), dict):
                    return key, parsed[key]
        text = doc.get("tail", raw) if isinstance(doc.get("tail"), str) else raw
    else:
        text = raw
    for key in ("floors", "queries"):
        got = _extract_map(text, key)
        if got:
            return key, got
    raise SystemExit(f"{path}: no floors/queries map found")


def _basis(path: str) -> str | None:
    raw = open(path).read()
    try:
        doc = json.loads(raw)
        if isinstance(doc, dict):
            if isinstance(doc.get("basis"), str):
                return doc["basis"]
            parsed = doc.get("parsed")
            if isinstance(parsed, dict) and isinstance(parsed.get("basis"), str):
                return parsed["basis"]
            raw = doc.get("tail", raw) if isinstance(doc.get("tail"), str) else raw
    except json.JSONDecodeError:
        pass
    m = re.search(r'"basis":\s*"([^"]+)"', raw)
    return m.group(1) if m else None


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    if len(argv) != 2:
        raise SystemExit(__doc__)
    sys.argv = [sys.argv[0], *argv]
    b1, b2 = _basis(sys.argv[1]), _basis(sys.argv[2])
    if b1 and b2 and b1 != b2:
        msg = (f"basis mismatch: {sys.argv[1]}={b1!r} vs {sys.argv[2]}={b2!r} "
               "— these numbers were measured differently")
        if not force:
            raise SystemExit(msg + " (pass --force to compare anyway)")
        print(f"WARNING: {msg} (--force given)")
    (k1, old), (k2, new) = load_floors(sys.argv[1]), load_floors(sys.argv[2])
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    print(f"old={sys.argv[1]} ({k1}, {len(old)} queries) "
          f"new={sys.argv[2]} ({k2}, {len(new)} queries)")
    print(f"{'query':34s} {'old':>7s} {'new':>7s} {'ratio':>7s}  flag")
    slower = faster = 0
    sum_old = sum_new = 0.0
    for q in common:
        r = new[q] / old[q] if old[q] else float("inf")
        flag = ""
        if r > 1.25:
            flag, slower = "SLOWER" + (" (sub-second: likely noise)" if new[q] < 1.0 else ""), slower + 1
        elif r < 0.8:
            flag, faster = "faster", faster + 1
        sum_old += old[q]; sum_new += new[q]
        print(f"{q:34s} {old[q]:7.3f} {new[q]:7.3f} {r:7.2f}  {flag}")
    print(f"\n{len(common)} common: sum {sum_old:.1f}s -> {sum_new:.1f}s "
          f"({sum_new / sum_old:.2f}x); {slower} slower >25%, {faster} faster >20%")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)}")
    print("note: +-39% drift measured on byte-identical sub-second queries "
          "in this environment; confirm real regressions via plan_audit.")


if __name__ == "__main__":
    main()
