"""JDBC source/sink wrappers (reference S4: PostgresClient.read,
``database/db_client.py:27-35``).

The engine's storage is the parquet lakehouse; these exist for parity
with the reference's Postgres surface and for cluster deployments that
front existing RDBMS data. Exercised end-to-end against the embedded
Derby driver pyspark bundles (``tests/test_jdbc.py``: write ->
4-partition range-bounded parallel read -> filter pushdown into the
JDBC scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Parallel JDBC read. Prefer ``table`` + partition bounds (Spark
    issues num_partitions range-bounded queries — the scalable path)
    over a single-connection ``query``. Filters on the result still
    push down to the database (Catalyst JDBC pushdown)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    reader = spark.read.format("jdbc").option("url", url)
    if table:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **options: str
) -> None:
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
