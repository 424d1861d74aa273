"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline slice at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry
(SURVEY.md §2 + LLM-pipeline extension ops) implemented in
``nba_data_pipeline_spark.harness``. Queries without an oracle entry
are non-SQL-expressible (engine-hash-based dedup/LSH, per-game
stateful lineup scans) and take the driver's rows-only check;
tests/ cross-check those against independent implementations.
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nba_data_pipeline_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_nanos_conf(spark)
    return harness.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    wrapped = {}
    for name, fn in harness.queries().items():
        wrapped[name] = _with_conf(fn)
    return wrapped


def oracle_sql() -> dict[str, str]:
    return harness.oracle_sql()


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """events.parquet stores TIMESTAMP(NANOS); the reader needs the
    legacy nanosAsLong conf (set in our session factory, but the
    driver may pass its own session)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def _with_conf(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_nanos_conf(spark)
        return fn(spark, sf_dir)

    return run
