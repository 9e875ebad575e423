"""Every registry query with an oracle must match DuckDB exactly at
sf0.001 (fast inner loop). The driver's gate runs sf0.01; run
`SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 pytest tests/test_correctness.py`
before committing a milestone."""

from __future__ import annotations

import os

import pytest

from clickhouse_25_5_3_75_stable_spark.queries import REGISTRY

from .oracle_harness import compare, duckdb_conn

TEST_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
NO_ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(TEST_SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, con, name):
    problems = compare(spark, con, TEST_SF, name)
    assert not problems, f"{name} @ {TEST_SF}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, TEST_SF)
    assert df.count() >= 0
