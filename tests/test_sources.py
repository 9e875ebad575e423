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
