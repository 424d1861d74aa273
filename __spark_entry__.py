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
    """events.parquet has stored ts as TIMESTAMP(NANOS) or as
    timestamp[us] NTZ depending on testdata generation; make a
    driver-supplied session read it as plain TIMESTAMP either way
    (our own session factory sets the same confs)."""
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass


def _with_conf(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_nanos_conf(spark)
        return fn(spark, sf_dir)

    return run
