"""CREATE DICTIONARY + dictGet family on the SQL route
(dictionary_sql.py; reference InterpreterCreateQuery dictionary
branch + FunctionsExternalDictionaries.h)."""
import pytest

from clickhouse_25_5_3_75_stable_spark.chsql import ChSqlError, ch_sql
from tests.conftest import SF_SMOKE


@pytest.fixture()
def nation_dict(spark):
    ch_sql(spark, """
        CREATE DICTIONARY t_nation_dict (
            n_name String DEFAULT 'unknown',
            n_regionkey UInt64
        ) PRIMARY KEY n_nationkey
        SOURCE(CLICKHOUSE(TABLE 'nation')) LAYOUT(HASHED()) LIFETIME(60)
    """, sf_dir=SF_SMOKE).collect()
    yield "t_nation_dict"
    ch_sql(spark, "DROP DICTIONARY IF EXISTS t_nation_dict").collect()


def test_dictget_hit_miss_defaults(spark, nation_dict):
    r = ch_sql(spark, """
        SELECT dictGet('t_nation_dict', 'n_name', toUInt64(3)) AS hit,
               dictGet('t_nation_dict', 'n_name', toUInt64(999)) AS attr_def,
               dictGet('t_nation_dict', 'n_regionkey', toUInt64(999)) AS zero_def,
               dictGetOrDefault('t_nation_dict', 'n_name', toUInt64(999),
                                'fb') AS fb,
               dictGetOrNull('t_nation_dict', 'n_name', toUInt64(999)) AS nul,
               dictHas('t_nation_dict', toUInt64(3)) AS has3,
               dictHas('t_nation_dict', toUInt64(999)) AS has999,
               dictGetString('t_nation_dict', 'n_name', toUInt64(3)) AS typed
    """).collect()[0]
    assert r.hit.startswith("NATION_") or len(r.hit) > 0
    assert r.attr_def == "unknown"      # DEFAULT clause
    assert r.zero_def == 0              # type zero default
    assert r.fb == "fb"
    assert r.nul is None
    assert (r.has3, r.has999) == (1, 0)
    assert r.typed == r.hit


def test_dict_fact_enrichment_is_broadcast(spark, nation_dict):
    import contextlib
    import io

    df = ch_sql(spark, """
        SELECT dictGet('t_nation_dict', 'n_name', s_nationkey) AS nat,
               count() AS n
        FROM supplier GROUP BY nat ORDER BY nat
    """, sf_dir=SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 3 and all(r.n > 0 for r in rows)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_range_hashed_dictionary(spark):
    rows = [(1, "2020-01-01", "2020-06-30", 10.0),
            (1, "2020-07-01", "2020-12-31", 20.0)]
    (spark.createDataFrame(rows, "id long, f string, t string, rate double")
     .selectExpr("id", "CAST(f AS DATE) f", "CAST(t AS DATE) t", "rate")
     .createOrReplaceTempView("t_rates_src"))
    ch_sql(spark, """
        CREATE DICTIONARY t_rate_dict (rate Float64)
        PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 't_rates_src'))
        LAYOUT(RANGE_HASHED()) RANGE(MIN f MAX t)
    """).collect()
    try:
        r = ch_sql(spark, """
            SELECT dictGet('t_rate_dict', 'rate', toUInt64(1),
                           toDate('2020-06-30')) AS edge,
                   dictGet('t_rate_dict', 'rate', toUInt64(1),
                           toDate('2020-07-01')) AS next_range,
                   dictGet('t_rate_dict', 'rate', toUInt64(1),
                           toDate('2021-01-01')) AS miss,
                   dictGetOrDefault('t_rate_dict', 'rate', toUInt64(1),
                                    toDate('2021-01-01'), -1.0) AS miss_fb
        """).collect()[0]
        # inclusive both ends (reference RangeHashedDictionary)
        assert (r.edge, r.next_range, r.miss, r.miss_fb) == (10.0, 20.0, 0.0, -1.0)
        # range dict without the range point argument refuses
        with pytest.raises(ChSqlError, match="range-point"):
            ch_sql(spark, "SELECT dictGet('t_rate_dict', 'rate', toUInt64(1))")
    finally:
        ch_sql(spark, "DROP DICTIONARY t_rate_dict").collect()


def test_complex_key_dictionary(spark):
    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0)]
    spark.createDataFrame(rows, "k1 string, k2 long, v double") \
        .createOrReplaceTempView("t_ck_src")
    ch_sql(spark, """
        CREATE DICTIONARY t_ck_dict (v Float64)
        PRIMARY KEY k1, k2 SOURCE(CLICKHOUSE(TABLE 't_ck_src'))
        LAYOUT(COMPLEX_KEY_HASHED())
    """).collect()
    try:
        r = ch_sql(spark, """
            SELECT dictGet('t_ck_dict', 'v', tuple('a', 2)) AS hit,
                   dictGet('t_ck_dict', 'v', ('b', 9)) AS miss
        """).collect()[0]
        assert (r.hit, r.miss) == (20.0, 0.0)
        with pytest.raises(ChSqlError, match="composite key"):
            ch_sql(spark, "SELECT dictGet('t_ck_dict', 'v', 'a')")
    finally:
        ch_sql(spark, "DROP DICTIONARY t_ck_dict").collect()


def test_dictionary_errors_and_registry(spark, nation_dict):
    with pytest.raises(ChSqlError, match="unknown dictionary"):
        ch_sql(spark, "SELECT dictGet('nope', 'a', 1)")
    with pytest.raises(ChSqlError, match="no attribute"):
        ch_sql(spark, "SELECT dictGet('t_nation_dict', 'bogus', 1)")
    with pytest.raises(ChSqlError, match="IPTrieDictionary"):
        ch_sql(spark, """
            CREATE DICTIONARY t_ip (zone String) PRIMARY KEY cidr
            SOURCE(CLICKHOUSE(TABLE 'nation')) LAYOUT(IP_TRIE())
        """)
    with pytest.raises(ChSqlError, match="not in the session catalog"):
        ch_sql(spark, """
            CREATE DICTIONARY t_missing (a String) PRIMARY KEY k
            SOURCE(CLICKHOUSE(TABLE 'no_such_table_xyz')) LAYOUT(HASHED())
        """)
    with pytest.raises(ChSqlError, match="derived table"):
        ch_sql(spark, """
            SELECT dictGet('t_nation_dict', 'n_name',
                           dictGet('t_nation_dict', 'n_regionkey', 1))
        """)
    # registry surfaces in system.dictionaries
    rows = ch_sql(spark, """
        SELECT name, type, key FROM system.dictionaries
        WHERE name = 't_nation_dict'
    """).collect()
    assert rows and rows[0].type == "hashed"
    assert rows[0].key == "n_nationkey"
    # DROP removes it; unknown DROP refuses unless IF EXISTS
    ch_sql(spark, "DROP DICTIONARY t_nation_dict").collect()
    with pytest.raises(ChSqlError, match="unknown dictionary"):
        ch_sql(spark, "DROP DICTIONARY t_nation_dict")
    ch_sql(spark, "DROP DICTIONARY IF EXISTS t_nation_dict").collect()
    with pytest.raises(ChSqlError, match="unknown dictionary"):
        ch_sql(spark, "SELECT dictGet('t_nation_dict', 'n_name', 1)")


def test_show_and_exists_dictionary(spark, nation_dict):
    names = [r.name for r in ch_sql(spark, "SHOW DICTIONARIES").collect()]
    assert "t_nation_dict" in names
    assert ch_sql(spark, "EXISTS DICTIONARY t_nation_dict").collect()[0][0] == 1
    assert ch_sql(spark, "EXISTS DICTIONARY nope_xyz").collect()[0][0] == 0


def test_hierarchical_dictionary(spark):
    rows = [(1, 0, "root"), (2, 1, "a"), (3, 1, "b"),
            (4, 2, "a1"), (5, 4, "a1x")]
    spark.createDataFrame(rows, "id long, parent long, label string") \
        .createOrReplaceTempView("t_org_src")
    ch_sql(spark, """
        CREATE DICTIONARY t_org_dict (label String,
                                      parent UInt64 HIERARCHICAL)
        PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 't_org_src'))
        LAYOUT(HASHED())
    """).collect()
    try:
        r = ch_sql(spark, """
            SELECT dictGetHierarchy('t_org_dict', toUInt64(5)) AS c5,
                   dictGetHierarchy('t_org_dict', toUInt64(99)) AS c99,
                   dictGetChildren('t_org_dict', toUInt64(1)) AS k1,
                   dictGetDescendants('t_org_dict', toUInt64(2)) AS d2,
                   dictGetChildren('t_org_dict', toUInt64(99)) AS k99,
                   dictIsIn('t_org_dict', toUInt64(5), toUInt64(1)) AS i51,
                   dictIsIn('t_org_dict', toUInt64(3), toUInt64(2)) AS i32,
                   dictIsIn('t_org_dict', toUInt64(5), toUInt64(5)) AS i55,
                   dictIsIn('t_org_dict', toUInt64(99), toUInt64(1)) AS i991
        """).collect()[0]
        assert r.c5 == [5, 4, 2, 1]
        assert r.c99 == [99]
        assert r.k1 == [2, 3] and r.d2 == [4, 5] and r.k99 == []
        assert (r.i51, r.i32, r.i55, r.i991) == (1, 0, 1, 0)
        # hierarchy functions on a non-hierarchical dict refuse
        ch_sql(spark, """
            CREATE DICTIONARY t_flat_d (label String) PRIMARY KEY id
            SOURCE(CLICKHOUSE(TABLE 't_org_src')) LAYOUT(FLAT())
        """).collect()
        with pytest.raises(ChSqlError, match="HIERARCHICAL"):
            ch_sql(spark, "SELECT dictGetHierarchy('t_flat_d', 1)")
        ch_sql(spark, "DROP DICTIONARY t_flat_d").collect()
    finally:
        ch_sql(spark, "DROP DICTIONARY t_org_dict").collect()


def test_system_reload_dictionary_rebuilds_closure(spark, tmp_path):
    """SYSTEM RELOAD DICTIONARY rebuilds the precomputed hierarchy
    closure against the live source (round-9 CLI wiring)."""
    from clickhouse_25_5_3_75_stable_spark.__main__ import run_local

    spark.createDataFrame([(1, 0), (2, 1)], "id long, parent long") \
        .createOrReplaceTempView("t_rl_src")
    ch_sql(spark, """
        CREATE DICTIONARY t_rl_dict (parent UInt64 HIERARCHICAL)
        PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 't_rl_src'))
        LAYOUT(HASHED())
    """).collect()
    try:
        r = ch_sql(spark,
                   "SELECT dictGetHierarchy('t_rl_dict', toUInt64(2)) AS c"
                   ).collect()[0]
        assert r.c == [2, 1]
        # the source view changes; closure is stale until RELOAD
        spark.createDataFrame([(1, 0), (2, 1), (3, 2)],
                              "id long, parent long") \
            .createOrReplaceTempView("t_rl_src")
        run_local("SYSTEM RELOAD DICTIONARY t_rl_dict",
                  str(tmp_path), spark=spark)
        r2 = ch_sql(spark,
                    "SELECT dictGetHierarchy('t_rl_dict', toUInt64(3)) AS c"
                    ).collect()[0]
        assert r2.c == [3, 2, 1]
    finally:
        ch_sql(spark, "DROP DICTIONARY t_rl_dict").collect()


def test_show_create_dictionary(spark, nation_dict):
    stmt = ch_sql(spark, "SHOW CREATE DICTIONARY t_nation_dict"
                  ).collect()[0][0]
    assert stmt.startswith("CREATE DICTIONARY t_nation_dict (")
    assert "n_name String DEFAULT 'unknown'" in stmt
    assert "PRIMARY KEY n_nationkey" in stmt
    assert "SOURCE(CLICKHOUSE(TABLE 'nation'))" in stmt
    assert "LAYOUT(HASHED())" in stmt
    with pytest.raises(ChSqlError, match="unknown"):
        ch_sql(spark, "SHOW CREATE DICTIONARY nope_x")


def test_file_source_dictionary(spark, tmp_path):
    """SOURCE(FILE(PATH .. FORMAT ..)) — reference
    FileDictionarySource: CSVWithNames and JSONEachRow files back a
    dictionary; declared types cast; unknown format/missing file
    refuse."""
    csv = tmp_path / "zones.csv"
    csv.write_text("zone_id,zone_name,rate\n1,north,1.5\n2,south,2.5\n")
    ch_sql(spark, f"""
        CREATE DICTIONARY t_file_dict (zone_name String,
                                       rate Float64)
        PRIMARY KEY zone_id
        SOURCE(FILE(PATH '{csv}' FORMAT 'CSVWithNames'))
        LAYOUT(FLAT())
    """).collect()
    try:
        r = ch_sql(spark, """
            SELECT dictGet('t_file_dict', 'zone_name', toUInt64(2)) AS nm,
                   dictGet('t_file_dict', 'rate', toUInt64(1)) AS rt,
                   dictGet('t_file_dict', 'rate', toUInt64(9)) AS miss
        """).collect()[0]
        assert (r.nm, r.rt, r.miss) == ("south", 1.5, 0.0)
        stmt = ch_sql(spark, "SHOW CREATE DICTIONARY t_file_dict"
                      ).collect()[0][0]
        assert "SOURCE(FILE(PATH" in stmt and "csvwithnames" in stmt
    finally:
        ch_sql(spark, "DROP DICTIONARY t_file_dict").collect()
    with pytest.raises(ChSqlError, match="not found"):
        ch_sql(spark, """
            CREATE DICTIONARY t_f2 (a String) PRIMARY KEY k
            SOURCE(FILE(PATH '/no/such.csv')) LAYOUT(HASHED())
        """)
    with pytest.raises(ChSqlError, match="sources/external"):
        ch_sql(spark, """
            CREATE DICTIONARY t_f3 (a String) PRIMARY KEY k
            SOURCE(MYSQL(HOST 'h')) LAYOUT(HASHED())
        """)
