"""Row-shaping scalar ops: synthetic ids, null fill, literal stamping.

Re-expresses reference ``utils/utils.py`` helpers as pure Column
expressions (no UDFs, fully codegen'd):
  - add_id      <- utils/utils.py:57-60  ('-'-join of key columns)
  - fill_nulls  <- utils/utils.py:28-37  (numeric -> 0.0, rest stays null)
  - stamp       <- utils/utils.py:40-54  (constant literal columns)
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)


def id_expr(cols: Iterable[str], sep: str = "-") -> Column:
    """``'-'``-joined string over key columns (cast to string first)."""
    return F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])


def add_id(df: DataFrame, cols: Iterable[str], id_col: str = "id", sep: str = "-") -> DataFrame:
    """Add a synthetic string primary key column.

    Unlike the reference there is no index; uniqueness is asserted
    separately (operators.incremental.assert_unique_key).
    """
    return df.withColumn(id_col, id_expr(cols, sep))


def fill_nulls(df: DataFrame, value: float = 0.0) -> DataFrame:
    """Dtype-aware null fill: numeric columns -> ``value``; all other
    columns keep their nulls (the reference normalizes non-numeric
    nulls to None, which is a no-op relationally)."""
    numeric = [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)]
    return df.na.fill(value, subset=numeric) if numeric else df


def stamp(df: DataFrame, fields: Mapping[str, object]) -> DataFrame:
    """Add constant literal columns (e.g. SEASON / SEASON_TYPE / GAME_ID)."""
    for name, value in fields.items():
        df = df.withColumn(name, F.lit(value))
    return df
