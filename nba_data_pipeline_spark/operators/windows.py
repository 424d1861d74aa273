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
