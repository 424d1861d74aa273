"""Contract checks on the driver-facing registry (cheap, no Spark jobs)."""

import inspect

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 70
    assert len(oracles) >= 60


def test_all_queries_are_two_arg_callables():
    for name, fn in entry.queries().items():
        sig = inspect.signature(fn)
        assert len(sig.parameters) == 2, name


def test_oracle_sql_are_nonempty_strings():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_jdbc_wrapper_validates_args(spark):
    import pytest
    from nba_data_pipeline_spark.sources.jdbc import read_jdbc

    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:postgresql://x/db")
    with pytest.raises(ValueError, match="requires lower_bound"):
        read_jdbc(spark, "jdbc:postgresql://x/db", table="t", partition_column="id")
