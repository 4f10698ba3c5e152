"""Differential tests: every registry query vs its DuckDB oracle at
sf0.001 — the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from universal_importer_duckdb_spark import entry_queries as eq
from universal_importer_duckdb_spark.testing import compare, duckdb_connection

ORACLE_NAMES = sorted(n for n, (_, sql) in eq.REGISTRY.items() if sql is not None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    fn, sql = eq.REGISTRY[name]
    df = fn(spark, sf_dir)
    compare(df, con, sql, name)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_oracle_keys_subset():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40


ROWS_ONLY = sorted(n for n, (_, sql) in eq.REGISTRY.items() if sql is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    fn, _ = eq.REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
