"""Parquet catalog over the test star schema.

The reference's table abstraction is IStorage + StorageMergeTree
(/root/reference/src/Storages/IStorage.h,
src/Storages/StorageMergeTree.h:27): immutable sorted parts, partition
pruning, PK-range scans. Spark equivalent: parquet (or Delta/Iceberg)
tables — min/max row-group stats + partition dirs give the same
pruning; `spark.read.parquet` is the ReadFromMergeTree analogue
(src/Processors/QueryPlan/ReadFromMergeTree.h:62).

At 100 TB the layout contract is: partition by a coarse time/tenant
key, sort-within-files by the query's PK analogue so min/max pruning
fires, and size files ~128-512 MB. Locally we read the driver's single
parquet files as-is.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor —
# the DirectKeyValueJoin / dictionary analogue
# (/root/reference/src/Interpreters/DirectJoin.h:19).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects (PARQUET_TYPE_ILLEGAL). Read it as raw nanos and
        # truncate to µs — the same floor-truncation DuckDB applies when
        # casting TIMESTAMP_NS → TIMESTAMP, so oracles line up. Runtime
        # conf: works under any caller's session (the driver builds its
        # own), and is a no-op for non-NANOS columns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Normalize ts to TIMESTAMP (with-tz) whichever way the reader
        # surfaced it: LongType nanos when the legacy conf took effect,
        # TIMESTAMP_NTZ otherwise. Under the engine's UTC session tz the
        # NTZ->TZ cast is wall-clock-identity, and event-time operators
        # (withWatermark, session_window) require the TZ type.
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so SQL-path queries run."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
