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
