"""Special table engines: Memory / Set / Join / Buffer / Null
(SURVEY §2.1; reference registrations at /root/reference/src/Storages/
registerStorages.cpp — StorageMemory.h, StorageSet.h (Set + Join),
StorageBuffer.h, StorageNull.h).

Spark-idiomatic mappings, not emulations:

- Memory  → a cached DataFrame + temp view (Spark's in-memory columnar
  cache IS StorageMemory's role).
- Set     → a deduplicated key relation used on the right of IN: the
  membership test plans as a broadcast semi-join, exactly the
  reference's Set-in-RAM probe.
- Join    → a pre-keyed build side; joinGet() is a broadcast lookup
  projection (the reference stores the hash table once and probes it
  per query — broadcast does the same per executor).
- Buffer  → batch small inserts in driver memory, flush to the target
  parquet when row/flush thresholds pass (the reference's RAM buffer
  in front of MergeTree, same trade: a crash loses the unflushed
  buffer).
- Null    → accepted and discarded writes (format("noop")).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class MemoryTable:
    """ENGINE = Memory: cache-backed named table."""

    def __init__(self, spark: SparkSession, name: str, df: DataFrame):
        self.name = name
        self.df = df.cache()
        self.df.createOrReplaceTempView(name)

    def read(self) -> DataFrame:
        return self.df

    def drop(self) -> None:
        self.df.unpersist()
        self.df.sparkSession.catalog.dropTempView(self.name)


class SetTable:
    """ENGINE = Set: persistent IN-set (StorageSet.h:79)."""

    def __init__(self, keys: DataFrame, key_col: str):
        self.key_col = key_col
        self.keys = keys.select(F.col(key_col)).distinct().cache()

    def filter_in(self, df: DataFrame, expr: Column, negate: bool = False) -> DataFrame:
        """WHERE expr [NOT] IN set — broadcast [anti-]semi join."""
        probe = F.broadcast(self.keys.withColumnRenamed(self.key_col, "__set_key"))
        how = "left_anti" if negate else "left_semi"
        return df.join(probe, expr == F.col("__set_key"), how)


class JoinTable:
    """ENGINE = Join: pre-built keyed build side + joinGet
    (StorageSet.h's StorageJoin / src/Functions/FunctionJoinGet.h)."""

    def __init__(self, source: DataFrame, key_col: str):
        self.key_col = key_col
        self.source = source.dropDuplicates([key_col]).cache()

    def join_get(self, df: DataFrame, attr: str, key_expr: Column, out: str) -> DataFrame:
        lookup = F.broadcast(
            self.source.select(
                F.col(self.key_col).alias("__jt_key"), F.col(attr).alias(out)
            )
        )
        return df.join(lookup, key_expr == F.col("__jt_key"), "left").drop("__jt_key")

    def join(self, df: DataFrame, key_expr: Column, how: str = "left") -> DataFrame:
        lookup = F.broadcast(
            self.source.withColumnRenamed(self.key_col, "__jt_key")
        )
        return df.join(lookup, key_expr == F.col("__jt_key"), how).drop("__jt_key")


# live registry feeding system.asynchronous_inserts (the Buffer engine
# is the library-mode analogue of the reference's async-insert queue)
BUFFER_TABLES: list["BufferTable"] = []


class BufferTable:
    """ENGINE = Buffer(target): RAM-buffered inserts, threshold flush
    (StorageBuffer.h:34 — min/max rows before pushing to the target)."""

    def __init__(self, spark: SparkSession, target_path: str, max_rows: int = 100_000):
        self.spark = spark
        self.target = target_path
        self.max_rows = max_rows
        self._pending: list[DataFrame] = []
        self._pending_rows = 0
        self._first_pending_at = None
        BUFFER_TABLES.append(self)

    def insert(self, df: DataFrame) -> None:
        import datetime

        n = df.count()
        if not self._pending:
            self._first_pending_at = datetime.datetime.now()
        self._pending.append(df)
        self._pending_rows += n
        if self._pending_rows >= self.max_rows:
            self.flush()

    def flush(self) -> None:
        self._first_pending_at = None
        if not self._pending:
            return
        out = self._pending[0]
        for d in self._pending[1:]:
            out = out.unionByName(d)
        out.write.mode("append").parquet(self.target)
        self._pending = []
        self._pending_rows = 0

    def read(self) -> DataFrame:
        """Buffer reads see target + unflushed rows (reference merges
        the RAM buffer into every SELECT)."""
        try:
            base = self.spark.read.parquet(self.target)
        except Exception:
            base = None
        pend = self._pending[0] if self._pending else None
        for d in self._pending[1:]:
            pend = pend.unionByName(d)
        if base is not None and pend is not None:
            return base.unionByName(pend)
        return base if base is not None else pend


class NullTable:
    """ENGINE = Null: accepts writes, stores nothing (StorageNull.h)."""

    @staticmethod
    def write(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()
