"""Access entities (access.py): CREATE/DROP USER/ROLE, GRANT/REVOKE,
SHOW GRANTS, system-table reflection."""
import pytest

from clickhouse_25_5_3_75_stable_spark.chsql import ChSqlError, ch_sql


@pytest.fixture(autouse=True)
def _clean_registry():
    from clickhouse_25_5_3_75_stable_spark import access

    access.reset()
    yield
    access.reset()


def test_user_role_grant_lifecycle(spark):
    ch_sql(spark, "CREATE USER analyst").collect()
    ch_sql(spark, "CREATE ROLE reader").collect()
    ch_sql(spark, "GRANT SELECT, SHOW ON *.* TO reader").collect()
    ch_sql(spark, "GRANT reader TO analyst WITH ADMIN OPTION").collect()
    ch_sql(spark, "GRANT INSERT ON default.orders TO analyst").collect()

    g = [r[0] for r in ch_sql(spark, "SHOW GRANTS FOR analyst").collect()]
    assert g == ["GRANT INSERT ON default.orders TO analyst",
                 "GRANT reader TO analyst WITH ADMIN OPTION"]
    users = {r.name: r.is_default for r in
             ch_sql(spark, "SELECT name, is_default FROM system.users"
                    ).collect()}
    assert users == {"default": 1, "analyst": 0}
    rg = ch_sql(spark, "SELECT user_name, granted_role_name, "
                       "with_admin_option FROM system.role_grants"
                ).collect()
    assert [tuple(r) for r in rg] == [("analyst", "reader", True)]

    ch_sql(spark, "REVOKE INSERT ON default.orders FROM analyst").collect()
    ch_sql(spark, "REVOKE reader FROM analyst").collect()
    assert ch_sql(spark, "SHOW GRANTS FOR analyst").count() == 0

    # dropping a role cleans its grants
    ch_sql(spark, "DROP ROLE reader").collect()
    assert ch_sql(spark, "SELECT count() AS n FROM system.grants "
                         "WHERE user_name = 'reader'").collect()[0][0] == 0
    ch_sql(spark, "DROP USER analyst").collect()


def test_access_errors(spark):
    with pytest.raises(ChSqlError, match="unknown grantee"):
        ch_sql(spark, "GRANT SELECT ON *.* TO nobody")
    ch_sql(spark, "CREATE USER u1").collect()
    with pytest.raises(ChSqlError, match="unknown privilege"):
        ch_sql(spark, "GRANT FLY ON *.* TO u1")
    with pytest.raises(ChSqlError, match="default user"):
        ch_sql(spark, "DROP USER default")
    with pytest.raises(ChSqlError, match="already exists"):
        ch_sql(spark, "CREATE USER u1")
    ch_sql(spark, "CREATE USER IF NOT EXISTS u1").collect()
    with pytest.raises(ChSqlError, match="nothing to revoke"):
        ch_sql(spark, "REVOKE SELECT ON *.* FROM u1")
    # default user keeps fresh-install grants in SHOW GRANTS
    g = [r[0] for r in ch_sql(spark, "SHOW GRANTS").collect()]
    assert g == ["GRANT ALL ON *.* TO default WITH GRANT OPTION"]
