"""Range-membership and as-of joins.

Spark has no native range/as-of join; this module provides the two
standard scalable formulations (SURVEY.md J6 / O3-b):

1. ``range_join`` — non-equi interval join. With a small interval side
   it broadcasts (nested-loop over a broadcast build side: fine); with
   two large sides, pass equi-key prefix columns so it becomes an
   equi-join + residual filter (shuffle on the keys, no cartesian).
2. ``asof_join`` — backward / forward / nearest as-of match via a
   tagged-union + window sweep: one shuffle on the key, partition-local
   sorts, no per-row probing. This is the classic merge-asof
   reformulated relationally so Catalyst/AQE can plan it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    equi_keys: Sequence[str] = (),
    how: str = "inner",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Join each left row to interval rows with lo <= point < hi.

    Reference analogue: "is event time inside any stint
    [IN_TIME_REAL, OUT_TIME_REAL)" (etl/play_by_play_with_players.py:81-111).
    """
    cond = (left[point_col] >= intervals[lo_col]) & (left[point_col] < intervals[hi_col])
    for k in equi_keys:
        cond = (left[k] == intervals[k]) & cond
    right = F.broadcast(intervals) if broadcast_intervals else intervals
    return left.join(right, on=cond, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row sharing key ``on``:

    - ``backward`` — greatest ``right_ts <= left_ts`` (default),
    - ``forward`` — least ``right_ts >= left_ts``,
    - ``nearest`` — whichever of the two is closer in time
      (merge_asof semantics; an exact tie in distance takes the
      backward match).

    Implementation: union both sides tagged on a common timeline and
    sweep with a window — backward carries the latest right row seen so
    far (``last(..., ignorenulls)`` over an unbounded-preceding frame),
    forward mirrors it with ``first`` over an unbounded-following
    frame. Right rows sort at-or-before left rows at equal timestamps,
    so an exact timestamp tie matches in every direction. One shuffle
    on the key, partition-local sorts, no per-row probing — the classic
    merge-asof reformulated relationally so Catalyst/AQE can plan it.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if "_mts" in right_vals:
        raise ValueError("right_vals may not contain the reserved name '_mts'")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    # Carry the matched right row as ONE struct, not per-column
    # last(): independent per-column carries would blend values from
    # different right rows whenever a right row holds a NULL in one
    # value column — merge_asof attaches the matched row as-is. The
    # struct leads with the matched timestamp (_mts) so `nearest` can
    # compare distances.
    r_struct_type = (
        "struct<_mts:" + rtypes[right_ts] + ","
        + ",".join(f"{v}:{rtypes[v]}" for v in right_vals) + ">"
    )
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        F.struct(F.col(right_ts).alias("_mts"), *[F.col(v) for v in right_vals]).alias("_r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Tie-breaker: when multiple right rows share (key, ts), order by the
    # value struct (field-wise lexicographic) so the greatest row wins on
    # every run/partitioning (otherwise last/first(..., ignorenulls) is
    # nondeterministic). Both sweeps pick the greatest struct: backward
    # takes the LAST non-null over ascending struct order; forward scans
    # forward over descending struct order, so its FIRST non-null is
    # likewise the greatest.
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side").desc(), F.col("_r").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        matched = F.last(F.col("_r"), ignorenulls=True).over(w_back)
    elif direction == "forward":
        matched = F.first(F.col("_r"), ignorenulls=True).over(w_fwd)
    else:
        b = F.last(F.col("_r"), ignorenulls=True).over(w_back)
        fw = F.first(F.col("_r"), ignorenulls=True).over(w_fwd)
        # distances are non-negative by construction; ts-typed columns
        # compare as day-time intervals, numeric ones as numbers
        matched = (
            F.when(b.isNull(), fw)
            .when(fw.isNull(), b)
            .when((F.col("_ts") - b["_mts"]) <= (fw["_mts"] - F.col("_ts")), b)
            .otherwise(fw)
        )
    carried = unioned.select("_side", "_l", matched.alias("_r"))
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_r.{v}").alias(v) for v in right_vals],
    )
    return out


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    lo_col: str,
    hi_col: str,
    min_gap: int = 0,
) -> DataFrame:
    """Union overlapping (or within ``min_gap``) intervals per key —
    gaps-and-islands: one window pass ordered by interval start where a
    new island begins when this start exceeds the running max of all
    previous ends (+gap), then one aggregate per island.

    The running max handles CONTAINED intervals correctly (a later
    short interval inside an earlier long one must not split the
    island — comparing against lag(hi) alone would).

    One shuffle on the key; numeric or timestamp-free long bounds.
    Output: key cols + (lo, hi, n_merged) per merged interval.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(lo_col), F.col(hi_col))
    prev_max_hi = F.max(hi_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_hi.isNull() | (F.col(lo_col) > prev_max_hi + min_gap), 1
    ).otherwise(0)
    island = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn("_island", island)
        .groupBy(*keys, "_island")
        .agg(
            F.min(lo_col).alias("lo"),
            F.max(hi_col).alias("hi"),
            F.count("*").alias("n_merged"),
        )
        .drop("_island")
    )
