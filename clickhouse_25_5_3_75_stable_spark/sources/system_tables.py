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


def system_functions(spark: SparkSession) -> DataFrame:
    """system.functions analogue (reference src/Storages/System/
    StorageSystemFunctions.cpp): every ClickHouse function name this
    engine's dialect resolves, with its origin — 'direct' (one Spark
    expression), 'composed' (built from several), or 'excluded' (with
    the documented reason). Driver-built from the registries: O(names),
    no data scan."""
    from clickhouse_25_5_3_75_stable_spark.functions.dialect import CH_FUNCTIONS as D1
    from clickhouse_25_5_3_75_stable_spark.functions.dialect_extras import (
        CH_FUNCTIONS_EXCLUDED,
    )
    from clickhouse_25_5_3_75_stable_spark.functions.dialect_extras import (
        CH_FUNCTIONS as D2,
    )

    rows = []
    seen = set()
    for reg, origin in ((D1, "direct"), (D2, "direct")):
        for name in reg:
            if name not in seen:
                rows.append((name, origin, None))
                seen.add(name)
    for name, reason in CH_FUNCTIONS_EXCLUDED.items():
        if name not in seen:
            rows.append((name, "excluded", reason))
            seen.add(name)
    return spark.createDataFrame(
        rows, "name string, origin string, exclusion_reason string"
    )


def system_parts(spark: SparkSession, layout_dir: str) -> DataFrame:
    """system.parts analogue over a MergeTree-style layout written by
    sources/layout.py (reference StorageSystemParts.cpp): one row per
    partition directory with file count and bytes — from filesystem
    metadata only."""
    import os

    rows = []
    for part in sorted(os.listdir(layout_dir)):
        p = os.path.join(layout_dir, part)
        if not os.path.isdir(p) or part.startswith("_"):
            continue
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        size = sum(os.path.getsize(os.path.join(p, f)) for f in files)
        rows.append((part, len(files), size))
    return spark.createDataFrame(rows, "partition string, n_files int, bytes_on_disk long")


def system_settings(spark: SparkSession) -> DataFrame:
    """system.settings analogue: the live Spark SQL conf (the engine's
    runtime settings surface)."""
    conf = spark.sparkContext.getConf().getAll()
    sql_conf = [(k, v) for k, v in conf]
    return spark.createDataFrame(sql_conf, "name string, value string")
