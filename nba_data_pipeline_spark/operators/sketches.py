"""Mergeable sketch tables for incremental distinct-count maintenance.

The 100 TB pattern: never recompute COUNT(DISTINCT) over history.
Aggregate each partition/day into a tiny HLL sketch row once
(``sketch_distinct``), persist the sketch table, and answer any
rollup — per day, per month, overall, or combined with a new day's
sketch — by merging sketches (``merge_distinct``), which reads bytes
proportional to the number of groups, not the number of events.

Built on Spark's Apache DataSketches integration
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
public API since 3.5): sketches are binary columns, mergeable across
any grouping, with ~2% relative error at the default lgConfigK=12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch row per group: the build step of a persisted
    sketch table. Partial aggregation applies — each task sketches its
    split and the shuffle carries sketch bytes, not raw values."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(out_col)
    )


def merge_distinct(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Roll sketch rows up to a coarser grouping and estimate: the
    read/merge step. ``group_cols`` may be any subset of the build
    grouping (empty list = grand total)."""
    grouped = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    )
    merged = grouped.agg(F.hll_union_agg(sketch_col).alias("_merged"))
    return merged.withColumn(
        out_col, F.hll_sketch_estimate("_merged").cast("long")
    ).drop("_merged")


def estimate(sketch: Column | str) -> Column:
    """Point estimate from a single sketch column."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c).cast("long")


def sketch_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "qsketch",
    k: int = 200,
) -> DataFrame:
    """One KLL quantile sketch row per group (double values): the build
    step of a persisted quantile-sketch table, the exact analogue of
    ``sketch_distinct`` for percentiles. At k=200 the rank error is
    ~1.1%; sketches shuffle as small binary blobs and merge across any
    regrouping — history is never rescanned to answer a new quantile."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(out_col)
    )


def merge_quantiles(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    sketch_col: str = "qsketch",
    prefix: str = "q",
) -> DataFrame:
    """Roll sketch rows up to a coarser grouping and read quantile
    estimates; ``group_cols`` may be any subset of the build grouping
    (empty = grand total). Output columns carry the full percent
    precision — ``q50`` for 0.5, ``q99_9`` for 0.999, ``q100`` for 1.0
    — so nearby quantiles (0.999 vs 1.0) can't silently collide into
    one duplicated name; generated duplicates raise."""
    grouped = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    )
    merged = grouped.agg(F.kll_merge_agg_double(sketch_col).alias("_m"))

    def _qname(q: float) -> str:
        # 0.5 -> q50, 0.999 -> q999, 1.0 -> q100: percent scaled, with
        # any sub-percent digits appended (trailing zeros stripped)
        s = f"{q * 100:.6f}".rstrip("0").rstrip(".").replace(".", "_")
        return f"{prefix}{s}"

    names = [_qname(float(q)) for q in quantiles]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"quantiles {quantiles} produce duplicate columns {sorted(dupes)}")
    outs = [
        F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(float(q))).alias(n)
        for q, n in zip(quantiles, names)
    ]
    return merged.select(*group_cols, *outs)


def quantile_rank(sketch: Column | str, value: Column) -> Column:
    """Estimated rank (0..1) of ``value`` in the sketched distribution.
    NOTE: Spark requires ``value`` to be a FOLDABLE double (a literal),
    not a per-row column — for per-group rank checks, invert the test
    and compute the exact rank of the sketch's estimate instead (see
    harness ``kll_quantile_gate``)."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.kll_sketch_get_rank_double(c, value.cast("double"))


def sketch_theta(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "tsketch",
    lg_k: int = 12,
) -> DataFrame:
    """One Theta sketch row per group. Theta sketches estimate the same
    distinct counts as HLL but additionally support set operations
    between sketches — 'users who did A and B'
    (``theta_set_estimate(op='intersection')``) and 'users who did A
    but not B' (``theta_difference_estimate``) over persisted
    per-segment sketch rows, without ever joining the raw history."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col, F.lit(lg_k)).alias(out_col)
    )


def theta_set_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    op: str = "union",
    sketch_col: str = "tsketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Combine theta sketch rows to a coarser grouping with a set
    operation and estimate the result: ``union`` = distinct across the
    merged groups, ``intersection`` = distinct present in EVERY merged
    group. ``group_cols`` may be any subset of the build grouping
    (empty = combine all rows)."""
    if op == "union":
        # no explicit lgNomEntries: forcing one would silently downsample
        # sketches built with a higher lg_k (same reason merge_distinct
        # lets hll_union_agg default)
        agg = F.theta_union_agg(sketch_col)
    elif op == "intersection":
        agg = F.theta_intersection_agg(sketch_col)
    else:
        raise ValueError(f"op must be union|intersection, got {op!r}")
    grouped = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    )
    merged = grouped.agg(agg.alias("_m"))
    return merged.withColumn(
        out_col, F.theta_sketch_estimate("_m").cast("long")
    ).drop("_m")


def theta_difference_estimate(sketch_a: Column | str, sketch_b: Column | str) -> Column:
    """Estimated distinct count of A \\ B from two theta sketch columns
    ('users who did A but not B'). Two-operand column expression — pivot
    per-segment sketch rows side-by-side first (e.g. a self-join or
    conditional-agg pivot on the segment key)."""
    a = F.col(sketch_a) if isinstance(sketch_a, str) else sketch_a
    b = F.col(sketch_b) if isinstance(sketch_b, str) else sketch_b
    return F.theta_sketch_estimate(F.theta_difference(a, b)).cast("long")


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency tables / heavy hitters
# ---------------------------------------------------------------------------

def sketch_frequencies(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "cms",
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One count-min sketch row per group: the frequency analogue of
    ``sketch_distinct`` — persist per-partition/day sketches once,
    answer any point-frequency query over any rollup by merging,
    never rescanning history. Overcount is bounded by eps * N with
    the given confidence (CMS never undercounts). Built on Spark's
    ``count_min_sketch`` aggregate (binary, mergeable)."""
    return df.groupBy(*group_cols).agg(
        F.count_min_sketch(
            value_col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias(out_col)
    )


def heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    min_share: float = 0.01,
) -> DataFrame:
    """Per-group heavy hitters: values occurring in at least
    ``min_share`` of the group's rows, with exact counts. This is the
    candidate-then-verify shape that scales: a first hash aggregate on
    (group, value) is itself the candidate set (count >= share * total
    needs no sketch when the value domain fits a shuffle — and after
    the inner aggregate the data is one row per DISTINCT value, not
    per event), then a broadcast of per-group totals prunes. Output:
    (group..., value, n, share_e6) ordered nowhere — callers sort.
    Use ``sketch_frequencies`` instead when the distinct-value domain
    itself is too large to shuffle and approximate point queries
    suffice."""
    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("n"))
    totals = df.groupBy(*group_cols).agg(F.count("*").alias("_tot"))
    joined = (
        counts.join(F.broadcast(totals), list(group_cols))
        if group_cols
        else counts.crossJoin(F.broadcast(totals))
    )
    return (
        joined.filter(F.col("n") >= F.col("_tot") * F.lit(min_share))
        .withColumn("share_e6", F.expr("n * 1000000L div _tot"))
        .drop("_tot")
    )
