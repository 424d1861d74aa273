"""Ordered/window computation: first-per-group, top-k, sessionization.

The reference's ordered logic is procedural pandas (first substitution
event per player, ``etl/players_on_court_at_start_of_period.py:73-122``);
here it's window functions, which shuffle once on the partition key and
sort within partitions — no global sort, so the plan scales linearly
with partition count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core.data import require_temporal, ts_micros


def _order_cols(order_by: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def first_row_per_group(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[str | Column]
) -> DataFrame:
    """First row of each group under a total order (reference O2/O5:
    first sub event per player; ``iloc[0]`` picks). Order must be made
    total by a unique tie-breaker column or results flap."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def top_k_per_group(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[str | Column], k: int
) -> DataFrame:
    """Top-k rows per group; the window sort is partition-local."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def add_row_number(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    out_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    return df.withColumn(out_col, F.row_number().over(w))


def running_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    out_col: str = "running",
) -> DataFrame:
    """Cumulative sum per group under a total order."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*_order_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def sessionize(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_by: Sequence[str | Column] | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``. Batch analogue of
    streaming ``session_window``; one shuffle on the partition key.
    """
    require_temporal(df, ts_col)
    order = _order_cols(order_by) if order_by else [F.col(ts_col)]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    micros = ts_micros(ts_col)
    gap = micros - F.lag(micros).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_new).over(wcum))


def running_distinct_count(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    out_col: str = "n_distinct_so_far",
) -> DataFrame:
    """Cumulative COUNT(DISTINCT value) per group under a total order.

    Stateful-scan-shaped computation (the same shape as the reference's
    lineup tracker O3) expressed relationally: flag each value's first
    occurrence with a per-(group, value) row_number, then cumulative-sum
    the flags. Two window passes, one shuffle each on the same key.
    """
    worder = _order_cols(order_by)
    w_first = Window.partitionBy(*partition_by, value_col).orderBy(*worder)
    w_cum = (
        Window.partitionBy(*partition_by)
        .orderBy(*worder)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_flag = F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    return df.withColumn("_first", first_flag).withColumn(
        out_col, F.sum("_first").over(w_cum)
    ).drop("_first")


def funnel_steps(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel analysis: the first time each user completes each
    step IN SEQUENCE (step k counts only strictly after that user's
    step k-1 time).

    Plan shape: one filtered min-aggregate per step, chained by an
    equi-join on the user key — every stage shuffles on the SAME key,
    so with AQE the exchanges reuse partitioning, and each stage's
    input is only the rows of that step's event type (filter pushed to
    the scan). No per-user event collection, no window over full
    history — state per user is one timestamp per step.

    Output: one row per user who completed step 1, with nullable
    ``step_<i>_ts`` columns for later steps.
    """
    require_temporal(df, ts_col)
    if not steps:
        raise ValueError("steps must name at least one event type")
    out = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("_ts")
        )
        # min(when(ts > prev)) keeps users whose candidate events all
        # precede the prior step (NULL step time), instead of dropping
        # them from the funnel frame entirely
        out = (
            out.join(nxt, "user", "left")
            .groupBy("user", *[f"step_{j}_ts" for j in range(1, i)])
            .agg(
                F.min(
                    F.when(F.col("_ts") > F.col(f"step_{i - 1}_ts"), F.col("_ts"))
                ).alias(f"step_{i}_ts")
            )
        )
    return out


def funnel_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel conversion summary: users reaching each ordered step.
    One tiny aggregate over ``funnel_steps``; result has len(steps) rows."""
    per_user = funnel_steps(df, user_col, type_col, ts_col, steps)
    aggs = [
        F.count(f"step_{i}_ts").cast("long").alias(f"n_step_{i}")
        for i in range(1, len(steps) + 1)
    ]
    wide = per_user.agg(*aggs)
    # unpivot by exploding structs — a union of per-step selects would
    # embed (and re-run) the whole funnel chain once per step
    structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"n_step_{i}").alias("n_users"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return wide.select(F.explode(structs).alias("f")).select("f.*")


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period; for each later period offset, how many came back.

    Periods are ``floor(epoch_days / period_days)`` — pure integer
    arithmetic, engine-portable (no calendar/timezone truncation).
    Two aggregates: per-user first period (shuffle on user), then the
    (cohort, offset) distinct-user rollup over per-user-period rows.

    Output: (cohort_period, period_offset, n_users) with offset 0 being
    the cohort size itself.
    """
    require_temporal(df, ts_col)
    period = F.floor(ts_micros(ts_col) / F.lit(86_400_000_000 * period_days)).cast("long")
    activity = df.select(
        F.col(user_col).alias("user"), period.alias("period")
    ).dropDuplicates(["user", "period"])
    first = activity.groupBy("user").agg(F.min("period").alias("cohort_period"))
    return (
        activity.join(first, "user")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.countDistinct("user").alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    type_col: str,
    gap_seconds: int,
    order_by: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Markov transition counts over sessionized event paths: for each
    consecutive event pair WITHIN a session, count (from_type, to_type).
    The empirical transition matrix behind path/flow analysis (sankey
    diagrams, next-event prediction baselines).

    Shape: sessionize (one shuffle on the user key) + a lead window on
    the same partitioning (no second shuffle — same key) + one small
    hash aggregate on the type pair.
    """
    sess = sessionize(df, partition_by, ts_col, gap_seconds, order_by=order_by)
    order = _order_cols(order_by) if order_by else [F.col(ts_col)]
    w = Window.partitionBy(*partition_by, "session_id").orderBy(*order)
    nxt = F.lead(type_col).over(w)
    return (
        sess.withColumn("_next", nxt)
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), F.col("_next").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )


def rolling_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    aggs: Sequence[str] = ("sum", "count", "avg"),
) -> DataFrame:
    """Event-time rolling aggregates per key: for each row, aggregate
    ``value_col`` over the trailing ``window_seconds`` (inclusive of
    the current row) — moving averages / rates as feature-engineering
    columns, DISTINCT from ``sliding_agg``: that buckets rows into
    fixed windows; this computes a per-ROW trailing view.

    RANGE frame on epoch-micros (one shuffle on the key, sort within
    partitions); ties in ts all see the same frame, so the result is
    deterministic without a tie-breaker. Output adds
    ``rolling_<agg>`` columns.
    """
    require_temporal(df, ts_col)
    micros = ts_micros(ts_col)
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(micros)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    fns = {"sum": F.sum, "count": F.count, "avg": F.avg, "min": F.min, "max": F.max}
    unknown = [a for a in aggs if a not in fns]
    if unknown:
        raise ValueError(f"unknown rolling aggs {unknown}: choose from {sorted(fns)}")
    cols = {f"rolling_{a}": fns[a](value_col).over(w) for a in aggs}
    return df.withColumns(cols)


def top_paths(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    type_col: str,
    gap_seconds: int,
    path_len: int = 3,
    k: int = 20,
    order_by: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Most common length-``path_len`` event paths within sessions —
    path mining (the n-gram generalization of ``event_transitions``):
    consecutive event-type runs counted corpus-wide, top-k by
    frequency.

    Same plan family as event_transitions: sessionize (one shuffle on
    the user key), ``path_len - 1`` lead windows on the SAME
    partitioning (no extra shuffle — Spark reuses the user-key
    clustering), one hash aggregate on the path string, TakeOrdered
    for the top-k (no global sort).
    Output: (path, n) with path like 'view>click>purchase'.
    """
    if path_len < 2:
        raise ValueError("path_len must be >= 2")
    sess = sessionize(df, partition_by, ts_col, gap_seconds, order_by=order_by)
    order = _order_cols(order_by) if order_by else [F.col(ts_col)]
    w = Window.partitionBy(*partition_by, "session_id").orderBy(*order)
    # window expressions must land as columns before the filter (Spark
    # rejects window functions inside WHERE)
    stepped = sess.withColumns(
        {f"_s{i}": F.lead(type_col, i).over(w) for i in range(1, path_len)}
    )
    path = F.concat_ws(">", F.col(type_col), *[F.col(f"_s{i}") for i in range(1, path_len)])
    counted = (
        stepped.filter(F.col(f"_s{path_len - 1}").isNotNull())  # truncated runs drop
        .withColumn("_path", path)
        .groupBy(F.col("_path").alias("path"))
        .agg(F.count("*").alias("n"))
    )
    return counted.orderBy(F.col("n").desc(), "path").limit(k)


def activity_profile(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-user weekly activity fingerprint: event counts by
    (day-of-week, hour-of-day) — the behavioral profile behind
    bot/anomaly detection and engagement cohorts.

    Calendar terms come from pure epoch-integer arithmetic (UTC):
    dow = (epoch_days + 4) % 7 (0 = Sunday; epoch day 0 was a
    Thursday), hour = (epoch_secs // 3600) % 24 — engine-portable, no
    timezone/calendar functions. One hash aggregate.
    """
    require_temporal(df, ts_col)
    secs = (ts_micros(ts_col) / F.lit(1_000_000)).cast("long")
    dow = F.pmod((secs / F.lit(86_400)).cast("long") + 4, F.lit(7))
    hour = F.pmod((secs / F.lit(3_600)).cast("long"), F.lit(24))
    return (
        df.groupBy(
            F.col(user_col).alias("user_id"),
            dow.cast("long").alias("dow"),
            hour.cast("long").alias("hour"),
        )
        .agg(F.count("*").alias("n"))
    )


def profile_entropy(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Shannon entropy of each user's (dow, hour) activity distribution
    — the classic bot signal (cron traffic concentrates in few cells ->
    low entropy; organic use spreads -> high). Built on
    ``activity_profile``; one extra aggregate per user.

    Portability: per-cell terms -p*ln(p) hit e6 fixed point BEFORE the
    per-user sum (exact integer aggregate, FP-order-free — the BM25 /
    trigram-LM policy), with p the IEEE-exact quotient of two counts.
    Output: (user_id, n_events, n_cells, entropy_e6).
    """
    prof = activity_profile(df, user_col, ts_col)
    totals = prof.groupBy("user_id").agg(F.sum("n").alias("_total"))
    p = F.col("n") / F.col("_total")
    term_e6 = F.round(-p * F.log(p) * 1e6).cast("long")
    return (
        prof.join(totals, "user_id")
        .withColumn("_t", term_e6)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.count("*").alias("n_cells"),
            F.sum("_t").alias("entropy_e6"),
        )
    )


def touch_attribution(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    lookback_seconds: int,
    type_codes: dict[str, int] | None = None,
) -> DataFrame:
    """First-touch and last-touch attribution: for every conversion
    event, the earliest and latest touch event by the same user within
    ``lookback_seconds`` before (or at) the conversion timestamp.

    Scale shape: ONE shuffle on the user key, then two RANGE-framed
    window aggregates over epoch-microsecond order — no self-join of
    events to events (the naive formulation), so cost is O(events)
    regardless of touches-per-conversion fan-in.

    Portability: the windowed min/max runs over a single ENCODED
    integer ``ts_us * 8 + type_code`` (type_code from the position in
    ``touch_types``, 1-based, or an explicit ``type_codes`` map — must
    stay < 8), decoded after — pure integer arithmetic reproducible in
    any engine, and simultaneous-touch ties resolve deterministically
    by code instead of engine-dependent struct ordering.

    Output: one row per conversion — (user, conv_ts_us, first/last
    touch type + ts_us, NULLs when no touch in the lookback).
    """
    require_temporal(df, ts_col)
    if type_codes is None:
        type_codes = {t: i for i, t in enumerate(touch_types, start=1)}
    if any(c <= 0 or c >= 8 for c in type_codes.values()):
        raise ValueError(f"type codes must be in [1, 7]: {type_codes}")
    us = ts_micros(ts_col)
    code = F.lit(None).cast("long")
    for t, c in type_codes.items():
        code = F.when(F.col(type_col) == t, F.lit(c).cast("long")).otherwise(code)
    enc = F.when(code.isNotNull(), us * F.lit(8) + code)
    base = df.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("_type"),
        us.alias("_us"),
        enc.alias("_enc"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy("_us")
        .rangeBetween(-int(lookback_seconds) * 1_000_000, 0)
    )
    attributed = base.withColumns(
        {"_first": F.min("_enc").over(w), "_last": F.max("_enc").over(w)}
    ).filter(F.col("_type") == conversion_type)

    decode_ts = lambda c: F.floor(F.col(c) / 8).cast("long")  # noqa: E731

    def decode_type(c: str) -> Column:
        out = F.lit(None).cast("string")
        for t, cd in type_codes.items():
            out = F.when(F.col(c) % 8 == cd, F.lit(t)).otherwise(out)
        return out

    return attributed.select(
        "user",
        F.col("_us").alias("conv_ts_us"),
        decode_type("_first").alias("first_touch_type"),
        decode_ts("_first").alias("first_touch_ts_us"),
        decode_type("_last").alias("last_touch_type"),
        decode_ts("_last").alias("last_touch_ts_us"),
    )
