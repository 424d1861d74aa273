"""Stint roll-up: group rows into an ordered array-of-struct column.

The reference builds STINTS as a JSON string via a pandas
groupby-apply UDAF (``etl/rotations.py:10-14,49-65``). Native Spark
needs no UDAF: ``collect_list(struct(...))`` + ``sort_array``. The
explicit sort neutralizes collect_list's shuffle-order
non-determinism (SURVEY.md §7.4 known-hard #1) so goldens are stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_structs(
    df: DataFrame,
    group_keys: Sequence[str],
    struct_cols: Sequence[str],
    out_col: str,
) -> DataFrame:
    """Group by ``group_keys``; collect ``struct_cols`` rows into one
    deterministically-ordered array<struct> column ``out_col``.

    sort_array orders structs field-by-field (first struct field is
    the primary sort key), which matches "stints ordered by IN_TIME_REAL".
    """
    collected = F.sort_array(F.collect_list(F.struct(*[F.col(c) for c in struct_cols])))
    return df.groupBy(*group_keys).agg(collected.alias(out_col))


def rollup_stints(rotation_raw: DataFrame) -> DataFrame:
    """gamerotation rows -> one row per (game, player) with STINTS array.

    Mirrors reference etl/rotations.py:33-65 (projection, rename
    PERSON_ID->PLAYER_ID, per-player stint aggregation) with native
    arrays instead of json.dumps.
    """
    keys = ["GAME_ID", "TEAM_ID", "TEAM_NAME", "PLAYER_ID", "PLAYER_FIRST", "PLAYER_LAST"]
    df = rotation_raw.withColumnRenamed("PERSON_ID", "PLAYER_ID")
    return rollup_structs(df, keys, ["IN_TIME_REAL", "OUT_TIME_REAL"], "STINTS")


def explode_stints(rotations: DataFrame, stint_col: str = "STINTS") -> DataFrame:
    """Inverse of the roll-up: one row per stint, struct flattened.

    This is the first step of the declarative lineup path (range join
    against event times — SURVEY.md O3 option b).
    """
    exploded = rotations.withColumn("_stint", F.explode(F.col(stint_col))).drop(stint_col)
    return exploded.select("*", "_stint.*").drop("_stint")


def stints_to_json(rotations: DataFrame, stint_col: str = "STINTS") -> DataFrame:
    """Postgres-parity boundary: array<struct> -> JSON string
    (reference stores JSON text, etl/rotations.py:13)."""
    return rotations.withColumn(stint_col, F.to_json(F.col(stint_col)))


def stints_from_json(df: DataFrame, stint_col: str = "STINTS") -> DataFrame:
    """JSON string -> array<struct> (reference re-parses with
    json.loads on every read, etl/play_by_play_with_players.py:16)."""
    from ..core.schemas import STINT
    from pyspark.sql import types as T

    return df.withColumn(stint_col, F.from_json(F.col(stint_col), T.ArrayType(STINT)))


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long unpivot: one output row per (id row, value column).

    Wraps the native ``DataFrame.unpivot`` (Catalyst ``Expand`` node):
    ONE scan of the input regardless of how many columns melt — the
    union-of-selects formulation re-runs the upstream plan once per
    column (the plan-shape trap test_plan_shapes pins for the quality
    suite's internal unpivot). Value columns are cast to a common type
    by Spark; cast explicitly first when mixing ints and doubles to
    control the result type. Inverse of a pivot; output:
    (*id_cols, var_name, value_name)."""
    return df.unpivot(
        ids=list(id_cols),
        values=list(value_cols),
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
