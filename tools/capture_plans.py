"""Capture .explain("formatted") for named queries into plans/<tag>/.

    python tools/capture_plans.py <tag> <suffix> name [name...]

Writes plans/<tag>/<name>_<suffix>.txt for each query (suffix is
"before" / "after"). One shared session: explain is driver-side and
cheap; queries whose construction runs eager fixture work still only
pay it once.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from nba_data_pipeline_spark import harness
    from nba_data_pipeline_spark.core.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("capture-plans")
    qs = harness.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
