"""Single-pass data-quality validation.

The reference's data-quality surface is the duplicate-key assertion and
NOT NULL DDL (SURVEY.md S10/A5); a pipeline feeding a 100 TB lakehouse
needs a fuller gate. The scale-correct shape: every check is a Column
predicate evaluated as a conditional aggregate, so N checks cost ONE
scan with map-side partial aggregation — never N passes, never a
``collect`` of violating rows.

Reference analogue: ``operators/incremental.py`` ``assert_unique_key``
(per-key duplicate gate); this generalizes it to arbitrary predicates.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """Evaluate named row-level expectations in one aggregate pass.

    ``checks`` maps check name -> boolean Column that should be TRUE for
    every valid row (NULL counts as a violation — an unknown is not a
    pass). Output: one row per check, (check_name, n_violations, n_rows,
    passed), computed with a single scan regardless of check count.
    An EMPTY input vacuously passes every check (0 violations, 0 rows) —
    SUM over zero rows is NULL, so each violation count is coalesced to
    0; without that an empty delta re-run would spuriously fail the gate.
    """
    if not checks:
        raise ValueError("at least one check required")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in checks.items():
        aggs.append(
            F.coalesce(F.sum(F.when(pred, 0).otherwise(1)), F.lit(0)).alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    # pivot the single agg row into one row per check with explode —
    # unioning per-check selects would re-run the aggregate (and the
    # scan) once per check
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"_v_{name}").cast("long").alias("n_violations"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col(f"_v_{name}") == 0).alias("passed"),
            )
            for name in checks
        ]
    )
    return row.select(F.explode(structs).alias("c")).select("c.*")


def assert_valid(df: DataFrame, checks: Mapping[str, Column]) -> None:
    """Action form: raise ``ValueError`` naming every failed check (with
    violation counts) if any expectation has violations. Use at pipeline
    gates the way the reference asserts unique keys before a write."""
    failed = [
        (r["check_name"], r["n_violations"])
        for r in validate(df, checks).collect()
        if not r["passed"]
    ]
    if failed:
        detail = ", ".join(f"{n} ({c} rows)" for n, c in failed)
        raise ValueError(f"data-quality checks failed: {detail}")
