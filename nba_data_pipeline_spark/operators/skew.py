"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in core.session) covers sort-merge
joins at runtime; these operators cover the remaining cases — a single
hot grouping key that swamps one reducer, and hash joins where one key
carries a disproportionate share of a huge probe side. Salt is
deterministic (hash of a row-unique column, not rand()) so re-runs and
retries are stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, unique_col: str, buckets: int, out_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) derived from a row-unique
    column (task-retry safe, unlike rand())."""
    return df.withColumn(out_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase sum/count under a hot grouping key: partial aggregate
    on (keys, salt) spreads the hot key over ``buckets`` reducers, the
    final aggregate combines ``buckets`` rows per key. Works for any
    algebraic aggregate; sum/count/min/max provided here.

    Output: keys + total (sum of value_col) + n (count).
    """
    salted = add_salt(df, unique_col, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value_col).alias("_s"), F.count("*").alias("_c")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_s").alias("total"), F.sum("_c").cast("long").alias("n")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    unique_col: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a skewed big side: salt the big side rows
    deterministically, replicate the small side across every salt
    value (explode over a literal range — rows × buckets), and join on
    (key, salt). The hot key's probe rows now hash to ``buckets``
    different reducers instead of one.
    """
    big_s = add_salt(big, unique_col, buckets)
    small_r = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(buckets)]))
    )
    out = big_s.join(small_r, on=[on, "_salt"], how=how)
    return out.drop("_salt")
