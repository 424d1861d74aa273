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

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
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


def outlier_flags(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z_threshold: float = 3.0,
    iqr_k: float = 1.5,
) -> DataFrame:
    """Per-group outlier flags by two standard rules, one stats pass:

    - z-score: |x - mean| / stddev_pop > z_threshold
    - IQR fence: x outside [q1 - k*IQR, q3 + k*IQR] (quartiles via the
      exact ``percentile`` aggregate, not percentile_approx, so
      small-group behavior is well-defined and engine-comparable)

    Shape: one grouped stats aggregate (tiny result, one row per
    group), broadcast back onto the stream — the full table is scanned
    once for stats and once for flagging; at 100 TB the stats side is
    negligible and the flag pass is map-only after the broadcast join.

    Z-scores are rounded to 6dp before comparison so engine-boundary
    FP noise cannot flip a flag at the threshold.
    """
    keys = list(group_cols)
    stats = df.groupBy(*keys).agg(
        F.avg(value_col).alias("_mean"),
        F.stddev_pop(value_col).alias("_sd"),
        F.expr(f"percentile({value_col}, 0.25)").alias("_q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("_q3"),
    )
    joined = df.join(F.broadcast(stats), keys)
    z = F.round(
        F.try_divide(F.abs(F.col(value_col) - F.col("_mean")), F.col("_sd")), 6
    )
    iqr = F.col("_q3") - F.col("_q1")
    out_iqr = (F.col(value_col) < F.col("_q1") - iqr_k * iqr) | (
        F.col(value_col) > F.col("_q3") + iqr_k * iqr
    )
    return (
        joined.withColumn("z_score", z)
        .withColumn("is_z_outlier", F.coalesce(z > z_threshold, F.lit(False)))
        .withColumn("is_iqr_outlier", F.coalesce(out_iqr, F.lit(False)))
        .drop("_mean", "_sd", "_q1", "_q3")
    )


def histogram(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram per group: ``width_bucket`` semantics
    (bucket 0 = below lo, n_bins + 1 = above hi), one hash aggregate.
    Output: key cols + (bucket, n) — empty buckets are absent (at
    corpus scale materializing empties per group is the wrong default).
    """
    keys = list(group_cols)
    v = F.col(value_col)
    bucket = (
        F.when(v < lo, 0)
        .when(v >= hi, n_bins + 1)
        .otherwise(F.floor((v - lo) / ((hi - lo) / n_bins)) + 1)
        .cast("long")
    )
    return (
        df.groupBy(*keys, bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile — the dbt/Deequ-style table summary feeding
    drift detection and data contracts: one row per column with row
    count, null count, distinct count, and min/max (as strings, so one
    result schema covers heterogeneous column types).

    ONE scan for everything: all per-column aggregates sit in a single
    agg (map-side partial), then one narrow unpivot of the tiny result.
    ``exact_distinct=False`` (default) uses approx_count_distinct — at
    100 TB exact per-column distincts force an expand+shuffle per
    column, and profiles feed monitoring where ~2% HLL error is fine;
    flip it on for the exact contract check (and the DuckDB oracle).
    """
    names = list(cols) if cols is not None else list(df.columns)
    distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count("*").alias("_n")]
    for c in names:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            distinct(c).alias(f"_dist_{c}"),
            # min/max in the NATIVE type, cast the result — casting the
            # column first would order numerics lexicographically
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot via explode of structs, NOT a union of per-column selects
    # — each unioned select embeds its own copy of the aggregate, so the
    # table would be scanned once per column (same trap validate()
    # documents)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("long").alias("n_rows"),
                F.col(f"_nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in names
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to the [lower_q,
    upper_q] exact quantiles of its group — the standard heavy-tail
    guard before training on numeric features. Same shape as
    ``outlier_flags``: one grouped quantile pass, broadcast back,
    map-only clip. Output adds ``<value>_winsorized`` (or ``out_col``).
    """
    if not 0.0 <= lower_q < upper_q <= 1.0:
        raise ValueError("need 0 <= lower_q < upper_q <= 1")
    keys = list(group_cols)
    out_col = out_col or f"{value_col}_winsorized"
    qs = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, {lower_q})").alias("_qlo"),
        F.expr(f"percentile({value_col}, {upper_q})").alias("_qhi"),
    )
    return (
        df.join(F.broadcast(qs), keys)
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("_qlo")), F.col("_qhi")),
        )
        .drop("_qlo", "_qhi")
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: Sequence[str] | None = None,
    null_rate_tol: float = 0.05,
    distinct_ratio_tol: float = 0.5,
    exact_distinct: bool = False,
) -> DataFrame:
    """Schema/statistics drift between two table versions: join the two
    ``profile_table`` outputs per column and flag suspicious movement —
    null-rate jumps beyond ``null_rate_tol`` (absolute) and distinct
    cardinality swinging by more than ``distinct_ratio_tol`` (relative).
    The monitoring check that catches a silently broken upstream feed
    before it trains into a model. Two single-scan profiles + a
    columns-sized join; approx distincts (the monitoring default).
    Output: (column, old/new null rates + distincts, drift flags).
    """
    po = profile_table(old, cols, exact_distinct).select(
        "column",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate_old"),
        F.col("n_distinct").alias("distinct_old"),
    )
    pn = profile_table(new, cols, exact_distinct).select(
        "column",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate_new"),
        F.col("n_distinct").alias("distinct_new"),
    )
    joined = po.join(pn, "column", "full_outer")
    null_jump = (
        F.abs(F.coalesce("null_rate_new", F.lit(1.0)) - F.coalesce("null_rate_old", F.lit(1.0)))
        > null_rate_tol
    )
    ratio = F.try_divide(
        F.col("distinct_new").cast("double"), F.col("distinct_old").cast("double")
    )
    distinct_swing = (
        ratio.isNull() | (ratio < 1 - distinct_ratio_tol) | (ratio > 1 + distinct_ratio_tol)
    )
    return joined.withColumns(
        {
            "null_rate_drift": null_jump,
            "distinct_drift": distinct_swing,
            "drifted": null_jump | distinct_swing,
        }
    )


def normalize_features(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    method: str = "zscore",
    out_col: str | None = None,
) -> DataFrame:
    """Per-group feature normalization, the three standard forms:

    - ``zscore``: (x - mean) / stddev_pop (NULL for constant groups via
      try_divide, never a divide-by-zero error under ANSI mode)
    - ``minmax``: (x - min) / (max - min), same constant-group contract
    - ``rank``: percent_rank — distribution-free, outlier-immune, the
      right choice before quantile-bucketed mixing

    zscore/minmax: one grouped stats aggregate broadcast back (map-only
    normalize). rank: one window pass (shuffle + partition-local sort —
    inherently order-based). Output in ``<value>_norm`` by default.
    """
    keys = list(group_cols)
    out_col = out_col or f"{value_col}_norm"
    if method == "rank":
        w = Window.partitionBy(*keys).orderBy(F.col(value_col))
        return df.withColumn(out_col, F.percent_rank().over(w))
    if method == "zscore":
        stats = df.groupBy(*keys).agg(
            F.avg(value_col).alias("_m"), F.stddev_pop(value_col).alias("_s")
        )
        norm = F.try_divide(F.col(value_col) - F.col("_m"), F.col("_s"))
        drop = ["_m", "_s"]
    elif method == "minmax":
        stats = df.groupBy(*keys).agg(
            F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
        )
        norm = F.try_divide(F.col(value_col) - F.col("_lo"), F.col("_hi") - F.col("_lo"))
        drop = ["_lo", "_hi"]
    else:
        raise ValueError(f"unknown method {method!r}: zscore, minmax, or rank")
    return df.join(F.broadcast(stats), keys).withColumn(out_col, norm).drop(*drop)
