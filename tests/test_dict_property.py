"""Property-based differential test of the SQL dictionary layer.

Hypothesis generates random dictionaries (key/value pairs with
duplicate keys allowed, random attribute DEFAULTs) and random lookup
key sets; dictGet / dictGetOrDefault / dictGetOrNull / dictHas run
through ch_sql and must agree exactly with a hand-built DuckDB
LEFT-JOIN oracle implementing the documented semantics (max() resolves
duplicate keys; absent keys take the attribute DEFAULT, else the type
zero). Integer-only values — no float noise.
"""
from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql

pairs_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12),
              st.integers(min_value=-50, max_value=50)),
    min_size=1, max_size=12,
)
lookups_st = st.lists(
    st.integers(min_value=0, max_value=15), min_size=1, max_size=8)
default_st = st.one_of(st.none(), st.integers(min_value=-9, max_value=9))


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.data_too_large])
@given(pairs=pairs_st, lookups=lookups_st, dflt=default_st)
def test_dictget_matches_join_oracle(spark, duck, pairs, lookups, dflt):
    spark.createDataFrame(pairs, "k long, v long") \
        .createOrReplaceTempView("fz_dict_src")
    dflt_sql = "" if dflt is None else f" DEFAULT {dflt}"
    ch_sql(spark, f"""
        CREATE DICTIONARY fz_dict (v Int64{dflt_sql}) PRIMARY KEY k
        SOURCE(CLICKHOUSE(TABLE 'fz_dict_src')) LAYOUT(HASHED())
    """).collect()
    try:
        spark.createDataFrame([(x,) for x in lookups], "q long") \
            .createOrReplaceTempView("fz_keys")
        got = sorted(
            tuple(r) for r in ch_sql(spark, """
                SELECT q,
                       dictGet('fz_dict', 'v', q) AS g,
                       dictGetOrDefault('fz_dict', 'v', q,
                                        toInt64(-999)) AS gd,
                       dictGetOrNull('fz_dict', 'v', q) AS gn,
                       dictHas('fz_dict', q) AS h
                FROM fz_keys
            """).collect()
        )
        duck.execute("CREATE OR REPLACE TABLE d AS SELECT * FROM (VALUES "
                     + ",".join(f"({k},{v})" for k, v in pairs)
                     + ") t(k, v)")
        duck.execute("CREATE OR REPLACE TABLE q AS SELECT * FROM (VALUES "
                     + ",".join(f"({x})" for x in lookups) + ") t(q)")
        fallback = 0 if dflt is None else dflt
        want = sorted(duck.execute(f"""
            WITH m AS (SELECT k, max(v) AS v FROM d GROUP BY k)
            SELECT q.q,
                   coalesce(m.v, {fallback}) AS g,
                   coalesce(m.v, -999) AS gd,
                   m.v AS gn,
                   CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS h
            FROM q LEFT JOIN m ON m.k = q.q
        """).fetchall())
        assert got == want
    finally:
        ch_sql(spark, "DROP DICTIONARY fz_dict").collect()


forest_st = st.lists(
    st.integers(min_value=0, max_value=10),  # parent = value % (i+1)
    min_size=2, max_size=10,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.data_too_large])
@given(shape=forest_st, probe=st.integers(min_value=1, max_value=12))
def test_hierarchy_closure_matches_recursive_cte(spark, duck, shape, probe):
    """dictGetHierarchy/dictIsIn vs a DuckDB recursive CTE over a
    random forest (parent < child, so acyclic; parent 0 = root)."""
    # node i+1 gets parent in [0, i] — guaranteed acyclic forest
    pairs = [(i + 1, v % (i + 1)) for i, v in enumerate(shape)]
    spark.createDataFrame(pairs, "id long, parent long") \
        .createOrReplaceTempView("fz_h_src")
    ch_sql(spark, """
        CREATE DICTIONARY fz_h (parent UInt64 HIERARCHICAL)
        PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 'fz_h_src'))
        LAYOUT(HASHED())
    """).collect()
    try:
        got = ch_sql(spark, f"""
            SELECT id,
                   dictGetHierarchy('fz_h', id) AS chain,
                   dictIsIn('fz_h', id, toUInt64({probe})) AS under
            FROM fz_h_src ORDER BY id
        """).collect()
        duck.execute(
            "CREATE OR REPLACE TABLE h AS SELECT * FROM (VALUES "
            + ",".join(f"({k},{v})" for k, v in pairs) + ") t(id, parent)")
        want = {r[0]: (r[1], r[2]) for r in duck.execute(f"""
            WITH RECURSIVE chains(id, node, depth) AS (
              SELECT id, id, 0 FROM h
              UNION ALL
              SELECT c.id, o.parent, c.depth + 1
              FROM chains c JOIN h o ON o.id = c.node WHERE o.parent <> 0
            )
            SELECT id, list(node ORDER BY depth) AS chain,
                   CASE WHEN list_contains(list(node), {probe})
                        THEN 1 ELSE 0 END AS under
            FROM chains GROUP BY id
        """).fetchall()}
        for r in got:
            w_chain, w_under = want[r.id]
            assert r.chain == w_chain, (r.id, r.chain, w_chain)
            assert r.under == w_under, (r.id, r.under, w_under)
    finally:
        ch_sql(spark, "DROP DICTIONARY fz_h").collect()
