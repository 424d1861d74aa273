"""Time-series regularization: fixed-step resampling onto a dense
per-key time spine with gap-aware forward fill.

The reference pipeline only ever appends event rows; a feature /
monitoring pipeline over the same data needs *regular* series — one
row per (key, step) even where nothing happened — before windowed
models, drift monitors, or charting can consume it. The classic pandas
form is ``df.resample(...).agg(...).ffill()``; the distributed form
here is fully declarative:

- The spine is ``sequence(min_bucket, max_bucket)`` per key, exploded —
  spine size is span/step rows per key, generated executor-side; no
  driver-side date arithmetic and no global range (a key observed only
  in week 3 gets no week-1 rows, so one ancient key cannot inflate
  every key's spine).
- The observed aggregate is one hash aggregate on (key, bucket).
- Forward fill is ``last(col, ignorenulls=True)`` over an unbounded-
  preceding window — partition-local after one shuffle on the key,
  the same scale shape as ``windows.running_sum``.

Everything keys on epoch-second buckets (BIGINT), never engine-local
timestamps, so results hash identically across engines (the same rule
harness.py applies to every temporal comparison).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core.data import require_temporal, ts_micros


def bucket_start(ts_col: str | Column, step_seconds: int) -> Column:
    """Epoch-second start of the fixed-width bucket containing ``ts``.
    Floor division on epoch micros — pure integer arithmetic."""
    micros = ts_micros(ts_col)
    step_us = int(step_seconds) * 1_000_000
    return ((micros - F.pmod(micros, F.lit(step_us))) / F.lit(1_000_000)).cast("long")


def time_spine(
    df: DataFrame, keys: Sequence[str], ts_col: str, step_seconds: int
) -> DataFrame:
    """Dense per-key bucket spine: one row per (keys, bucket_ts) for
    every step between the key's first and last observation (inclusive).
    ``bucket_ts`` is the bucket's epoch-second start."""
    require_temporal(df, ts_col)
    b = bucket_start(ts_col, step_seconds)
    bounds = df.groupBy(*keys).agg(
        F.min(b).alias("_lo"), F.max(b).alias("_hi")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence("_lo", "_hi", F.lit(int(step_seconds)))
        ).alias("bucket_ts"),
    )


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Column,
    cols: Sequence[str],
) -> DataFrame:
    """Replace NULLs in ``cols`` with the latest preceding non-NULL
    value within the key, under a total order on ``order_col`` (leading
    NULLs stay NULL). One shuffle on the key; the fill itself is a
    partition-local running ``last(ignorenulls)``."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def resample_ffill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    step_seconds: int,
    aggs: dict[str, Column],
    fill_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Resample to a fixed step and forward-fill the gaps.

    ``aggs`` maps output column name -> aggregate expression evaluated
    per (keys, bucket); every spine bucket with no observations gets
    NULL aggregates, then ``fill_cols`` (default: all agg columns) are
    forward-filled from the latest observed bucket. ``n_obs`` counts the
    bucket's raw rows (0 on gap rows — the gap indicator survives the
    fill). Output: (*keys, bucket_ts, n_obs, *aggs)."""
    require_temporal(df, ts_col)
    observed = (
        df.withColumn("bucket_ts", bucket_start(ts_col, step_seconds))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.count("*").alias("_n"),
            *[expr.alias(name) for name, expr in aggs.items()],
        )
    )
    spine = time_spine(df, keys, ts_col, step_seconds)
    joined = spine.join(observed, [*keys, "bucket_ts"], "left").withColumn(
        "n_obs", F.coalesce("_n", F.lit(0)).cast("long")
    )
    fill = list(fill_cols) if fill_cols is not None else list(aggs)
    filled = forward_fill(joined, keys, F.col("bucket_ts"), fill)
    return filled.select(*keys, "bucket_ts", "n_obs", *aggs.keys())


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    cols: Sequence[str],
) -> DataFrame:
    """Replace NULLs in ``cols`` with the LINEAR interpolation between
    the nearest preceding and following non-NULL observations within
    the key, positioned by ``order_col`` (numeric). pandas
    ``Series.interpolate()`` semantics: leading gaps stay NULL,
    trailing gaps carry the last value flat, interior gaps get
    value-proportional fill.

    Fully declarative: two frame passes per column (running
    ``last(ignorenulls)`` backward-looking, ``first(ignorenulls)``
    forward-looking) over ONE shuffle on the key — same scale shape as
    ``forward_fill``; no Python boundary, no per-key collect.
    """
    wb = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = df
    o = F.col(order_col).cast("double")
    for c in cols:
        v = F.col(c).cast("double")
        marked = F.when(v.isNotNull(), o)
        prev_v = F.last(v, ignorenulls=True).over(wb)
        prev_o = F.last(marked, ignorenulls=True).over(wb)
        next_v = F.first(v, ignorenulls=True).over(wf)
        next_o = F.first(marked, ignorenulls=True).over(wf)
        interp = (
            F.when(v.isNotNull(), v)
            .when(prev_v.isNull(), F.lit(None).cast("double"))
            .when(next_v.isNull(), prev_v)
            .otherwise(
                prev_v + (next_v - prev_v) * (o - prev_o) / (next_o - prev_o)
            )
        )
        out = out.withColumn(c, interp)
    return out


def resample_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    step_seconds: int,
    aggs: dict[str, Column],
    interp_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Resample to a fixed step and linearly interpolate the gaps —
    ``resample_ffill``'s twin for quantities where a step function
    misrepresents the gap (sensor readings, balances, rates). Same
    spine/aggregate shape; only the fill policy differs. ``n_obs`` = 0
    still marks synthesized rows. Output: (*keys, bucket_ts, n_obs,
    *aggs)."""
    require_temporal(df, ts_col)
    observed = (
        df.withColumn("bucket_ts", bucket_start(ts_col, step_seconds))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.count("*").alias("_n"),
            *[expr.alias(name) for name, expr in aggs.items()],
        )
    )
    spine = time_spine(df, keys, ts_col, step_seconds)
    joined = spine.join(observed, [*keys, "bucket_ts"], "left").withColumn(
        "n_obs", F.coalesce("_n", F.lit(0)).cast("long")
    )
    fill = list(interp_cols) if interp_cols is not None else list(aggs)
    filled = interpolate_linear(joined, keys, "bucket_ts", fill)
    return filled.select(*keys, "bucket_ts", "n_obs", *aggs.keys())


def activity_bursts(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    step_seconds: int,
    factor: int = 3,
    trailing: int = 7,
) -> DataFrame:
    """Burst detection on the regularized series: a bucket is a burst
    when its event count exceeds ``factor`` times the mean of the
    ``trailing`` preceding buckets (gap buckets count as zero — a
    spike after silence IS a burst), with a full-history requirement
    so the first ``trailing`` buckets never flag on a short baseline.

    The comparison is ``n_obs * trailing > factor * trailing_sum`` —
    pure integer arithmetic, no FP mean, engine-exact (same rationale
    as every e6 fixed-point ratio in this package). One shuffle on the
    key; the trailing window is partition-local. Output: (*keys,
    bucket_ts, n_obs, trailing_sum, is_burst)."""
    spine = resample_ffill(df, keys, ts_col, step_seconds, aggs={})
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(-int(trailing), -1)
    )
    return spine.select(
        *keys,
        "bucket_ts",
        "n_obs",
        F.coalesce(F.sum("n_obs").over(w), F.lit(0)).cast("long").alias("trailing_sum"),
        (
            (F.count("*").over(w) == int(trailing))
            & (F.col("n_obs") * F.lit(int(trailing))
               > F.lit(int(factor)) * F.coalesce(F.sum("n_obs").over(w), F.lit(0)))
        ).alias("is_burst"),
    )
