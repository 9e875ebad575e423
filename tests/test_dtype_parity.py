"""Round-4 regression gate for the driver's dtype-sensitive row hash.

Round 3's three red gate rows (`type_uint64_beyond_int64`,
`chsql_prewhere_yearly`, `pack_token_budget_shards`) were all
value-exact but hashed differently because the DuckDB oracle's output
dtype silently widened past Spark's (SUM(BIGINT)->HUGEINT,
EXTRACT(year)->BIGINT vs year()->INT, decimal arithmetic widening).
This test binds every registry oracle in DuckDB (no execution) and
demands strict canonical dtype equality with the Spark query's schema,
so the whole divergence class fails pytest before the driver sees it.
"""

from __future__ import annotations

import os

import pytest

from clickhouse_25_5_3_75_stable_spark.queries import REGISTRY

from .oracle_harness import dtype_parity, duckdb_conn

TEST_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(TEST_SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_dtype_parity(spark, con, name):
    problems = dtype_parity(spark, con, TEST_SF, name)
    assert not problems, f"{name} dtype divergence:\n" + "\n".join(problems)
