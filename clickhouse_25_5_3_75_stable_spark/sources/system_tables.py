"""``system.*`` introspection tables.

The reference exposes ~218 system tables (/root/reference/src/Storages/
System/); the universally-used ones are ``system.tables``,
``system.columns``, ``system.numbers`` and ``system.one``. We expose
the same surface as DataFrames derived from the parquet catalog —
schema comes from parquet footers (no data scan), so these stay O(1)
at any data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_25_5_3_75_stable_spark.sources.catalog import TABLES, load_table

_COLS_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("column_name", T.StringType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("data_type", T.StringType(), False),
    ]
)


def system_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """system.columns analogue (reference src/Storages/System/
    StorageSystemColumns.cpp): one row per column of every catalog
    table, with 1-based ordinal position and Spark type name."""
    rows = []
    for name in TABLES:
        for i, f in enumerate(load_table(spark, sf_dir, name).schema.fields, start=1):
            rows.append((name, f.name, i, f.dataType.simpleString()))
    return spark.createDataFrame(rows, _COLS_SCHEMA)


def system_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """system.tables analogue: table name + column count."""
    cols = system_columns(spark, sf_dir)
    return cols.groupBy("table_name").agg(F.count(F.lit(1)).alias("n_columns"))


def system_numbers(spark: SparkSession, n: int) -> DataFrame:
    """system.numbers / numbers(n) (also in sources/table_functions.py)."""
    return spark.range(n).withColumnRenamed("id", "number")


def system_one(spark: SparkSession) -> DataFrame:
    """system.one: single row, single UInt8 zero — SELECT 1 support."""
    return spark.range(1).select(F.lit(0).cast("tinyint").alias("dummy"))
