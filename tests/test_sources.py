"""Tests: executable-surface (UDTF, mapInPandas) and MergeTree-style
write layout (partition pruning + row-group skipping)."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.sources.catalog import load_table
from clickhouse_25_5_3_75_stable_spark.sources.executable import (
    TokenizeUDTF,
    script_transform,
    tokenize_table,
)
from clickhouse_25_5_3_75_stable_spark.sources.layout import read_table, write_mergetree_layout
from tests.conftest import SF_SMOKE


def test_tokenize_udtf(spark):
    rows = tokenize_table(spark, "the quick brown fox").collect()
    assert [(r.token, r.pos) for r in rows] == [
        ("the", 0), ("quick", 1), ("brown", 2), ("fox", 3),
    ]


def test_udtf_lateral_join_sql(spark):
    """UDTF in SQL: table-function in the FROM clause (reference
    StorageExecutable used as a table)."""
    spark.udtf.register("tokenize", TokenizeUDTF)
    rows = spark.sql(
        "SELECT t.token FROM VALUES ('a b'), ('c') AS v(s), LATERAL tokenize(s) t"
    ).collect()
    assert sorted(r.token for r in rows) == ["a", "b", "c"]


def test_script_transform_batches(spark):
    df = spark.range(100).select(F.col("id").cast("bigint"))

    def double_it(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": pdf["id"], "twice": pdf["id"] * 2})

    out = script_transform(df, double_it, "id bigint, twice bigint")
    got = {r.id: r.twice for r in out.collect()}
    assert got[7] == 14 and len(got) == 100


def test_layout_partition_pruning_and_rowgroup_stats(spark):
    d = tempfile.mkdtemp(prefix="layout_")
    try:
        orders = load_table(spark, SF_SMOKE, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        write_mergetree_layout(
            orders, d, order_by=["o_orderkey"], partition_by=["o_year"],
        )
        back = read_table(spark, d)
        # partition pruning: a year filter must reach PartitionFilters
        plan = (
            back.filter(F.col("o_year") == 1996)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [" in plan and "o_year" in plan.split("PartitionFilters")[1][:200]
        # row-group stats: PK range predicate is pushed to parquet
        plan2 = (
            back.filter(F.col("o_orderkey") < 100)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [" in plan2 and "LessThan(o_orderkey,100)" in plan2
        # and the data round-trips
        assert back.count() == orders.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_column_kinds_insert_and_read(spark):
    """DEFAULT fills absent/null, MATERIALIZED always recomputes,
    EPHEMERAL feeds defaults then vanishes, ALIAS projects at read
    (reference src/Storages/ColumnDefault.h kinds)."""
    from clickhouse_25_5_3_75_stable_spark.sources.columns_description import TableSchema

    schema = TableSchema(
        defaults={"city": F.upper(F.col("raw_city"))},
        materialized={"name_len": F.length(F.col("name"))},
        aliases={"shout": F.concat(F.col("name"), F.lit("!"))},
        ephemeral=("raw_city",),
    )
    incoming = spark.createDataFrame(
        [("ada", None, "paris"), ("bob", "Oslo", "ignored")],
        "name string, city string, raw_city string",
    )
    stored = schema.apply_insert(incoming)
    assert "raw_city" not in stored.columns
    rows = {r.name: (r.city, r.name_len) for r in stored.collect()}
    assert rows["ada"] == ("PARIS", 3)  # default filled from ephemeral
    assert rows["bob"] == ("Oslo", 3)  # provided value kept
    read = schema.reading_view(stored)
    assert {r.name: r.shout for r in read.collect()}["ada"] == "ada!"
    # MATERIALIZED is not insertable; EPHEMERAL is
    cols = schema.insertable_columns(stored.columns)
    assert "name_len" not in cols and "raw_city" in cols


def test_external_sqlite_bridge_read_and_pushdown(spark, tmp_path):
    """External-DB engine surface (registerStorages.cpp:60-103): read a
    SQLite table through the engine API; the predicate must execute on
    the remote side (bridge path here — no JDBC jars in the sandbox)."""
    import sqlite3

    from clickhouse_25_5_3_75_stable_spark.sources.external import (
        ExternalEngine,
        read_external,
    )

    db = str(tmp_path / "dim.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE tiers (k INTEGER, name TEXT)")
    con.executemany("INSERT INTO tiers VALUES (?, ?)", [(i, f"t{i}") for i in range(10)])
    con.commit()
    con.close()

    spec = ExternalEngine(kind="sqlite", table="tiers", database=db)
    df = read_external(spark, spec)
    assert df.count() == 10
    got = {r.k: r.name for r in read_external(spark, spec, predicate="k < 3").collect()}
    assert got == {0: "t0", 1: "t1", 2: "t2"}


def test_external_duckdb_bridge(spark, tmp_path):
    import duckdb

    from clickhouse_25_5_3_75_stable_spark.sources.external import (
        ExternalEngine,
        read_external,
    )

    db = str(tmp_path / "ext.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE rates (cur TEXT, rate DOUBLE)")
    con.execute("INSERT INTO rates VALUES ('usd', 1.0), ('eur', 1.1)")
    con.close()
    spec = ExternalEngine(kind="duckdb", table="rates", database=db)
    got = {r.cur: r.rate for r in read_external(spark, spec).collect()}
    assert got == {"usd": 1.0, "eur": 1.1}


def test_external_jdbc_options_scale_path():
    """The JDBC option map must carry the remote-pushdown subquery and
    the parallel-range-scan quad — the configuration a real cluster
    uses (no jar needed to verify construction)."""
    from clickhouse_25_5_3_75_stable_spark.sources.external import (
        ExternalEngine,
        jdbc_options,
    )

    spec = ExternalEngine(
        kind="postgresql", table="public.orders", database="shop",
        host="pg.internal", port=5432, user="u", password="p",
    )
    opts = jdbc_options(
        spec, predicate="o_orderdate >= '1996-01-01'",
        partition_column="o_orderkey", lower_bound=0, upper_bound=6000000,
        num_partitions=32,
    )
    assert opts["url"] == "jdbc:postgresql://pg.internal:5432/shop"
    assert opts["driver"] == "org.postgresql.Driver"
    assert "WHERE o_orderdate >= '1996-01-01'" in opts["dbtable"]
    assert opts["numPartitions"] == "32" and opts["partitionColumn"] == "o_orderkey"


def test_lake_format_detection_and_errors(spark, tmp_path):
    """Data-lake connectors (registerStorages.cpp:39-47): capability
    probe + actionable error when the jar is absent; raw-parquet
    fallback reads an append-only Delta-layout directory."""
    import pytest

    from clickhouse_25_5_3_75_stable_spark.sources.datalake import (
        available_lake_formats,
        read_lake,
        read_lake_fallback,
    )

    avail = available_lake_formats(spark)
    assert set(avail) == {"delta", "iceberg", "hudi"}
    for fmt, ok in avail.items():
        if not ok:
            with pytest.raises(RuntimeError, match="connector jar"):
                read_lake(spark, fmt, "/tmp/nowhere")
    with pytest.raises(ValueError):
        read_lake(spark, "paimon", "/tmp/x")
    # append-only delta-layout dir == parquet + _delta_log
    d = tmp_path / "dl"
    spark.range(5).write.parquet(str(d))
    (d / "_delta_log").mkdir()
    assert read_lake_fallback(spark, str(d)).count() == 5


def test_zeros_and_format_table(spark):
    from clickhouse_25_5_3_75_stable_spark.sources.table_functions import (
        format_table,
        zeros,
    )

    z = zeros(spark, 5)
    assert z.columns == ["zero"] and z.agg(F.sum("zero")).collect()[0][0] == 0
    j = format_table(spark, "JSONEachRow", '{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}')
    assert sorted((r.a, r.b) for r in j.collect()) == [(1, "x"), (2, "y")]
    c = format_table(spark, "CSVWithNames", "k,v\n1,one\n2,two", schema="k int, v string")
    assert sorted((r.k, r.v) for r in c.collect()) == [(1, "one"), (2, "two")]


def test_object_store_uri_and_conf(spark, tmp_path):
    from clickhouse_25_5_3_75_stable_spark.sources.object_store import (
        normalize_uri,
        object_store_conf,
        read_uri,
    )

    assert normalize_uri("s3://bucket/key/*.parquet") == "s3a://bucket/key/*.parquet"
    assert normalize_uri("wasb://c@a.blob/x") == "wasbs://c@a.blob/x"
    assert normalize_uri("/tmp/x").startswith("file:///")
    conf = object_store_conf("s3", endpoint="http://minio:9000")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    import pytest

    with pytest.raises(ValueError):
        object_store_conf("ftp")
    # same code path via file:// (Hadoop FileSystem)
    p = str(tmp_path / "t")
    spark.range(4).write.parquet(p)
    assert read_uri(spark, p).count() == 4


def test_parquet_index_mergetree_index_analogue(spark):
    """mergeTreeIndex() analogue: row-group min/max stats from parquet
    footers, no data scan; pruning predicate marks skippable groups."""
    from clickhouse_25_5_3_75_stable_spark.sources.parquet_index import (
        parquet_index,
        prunable_row_groups,
    )
    from tests.conftest import SF_SMOKE

    idx = parquet_index(spark, SF_SMOKE + "/lineitem.parquet")
    assert idx.count() > 0
    cols = {r.column for r in idx.select("column").distinct().collect()}
    assert "l_orderkey" in cols and "l_shipdate" in cols
    ok = idx.filter(
        (F.col("column") == "l_orderkey") & F.col("min_value").isNotNull()
    ).collect()
    assert all(int(r.min_value) <= int(r.max_value) for r in ok)
    pr = prunable_row_groups(
        spark, SF_SMOKE + "/lineitem.parquet", "l_orderkey", "-10", "-1"
    ).collect()
    assert all(r.skipped for r in pr)  # negative key range hits nothing
