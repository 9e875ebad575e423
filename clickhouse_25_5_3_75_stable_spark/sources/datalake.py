"""Data-lake table formats: Delta Lake / Iceberg / Hudi (SURVEY §2.1).

Reference engines: StorageDeltaLake / StorageIceberg / StorageHudi
(/root/reference/src/Storages/registerStorages.cpp:39-47, backed by
src/Storages/ObjectStorage/DataLakes/). ClickHouse reads these lake
layouts read-only over object storage; Spark's own connectors
(delta-spark, iceberg-spark-runtime, hudi-spark-bundle) are the
canonical implementations the reference chases, so the mapping is
"load the connector and `spark.read.format(...)`".

The sandbox ships none of the connector jars, so this module's job is
honest capability detection: :func:`available_lake_formats` probes the
JVM classpath, :func:`read_lake` uses the real connector when present
and raises a specific, actionable error when not (instead of Spark's
opaque ClassNotFoundException deep in a plan). A Delta/Iceberg table
is parquet underneath + a transaction log; :func:`read_lake_fallback`
can read the RAW parquet of a Delta table directory — correct ONLY for
tables that have never seen deletes/updates/compaction, and says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROBE_CLASSES = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
    "hudi": "org.apache.hudi.DefaultSource",
}


def available_lake_formats(spark: SparkSession) -> dict[str, bool]:
    """Which lake connectors are actually loadable in this JVM."""
    out = {}
    for fmt, cls in _PROBE_CLASSES.items():
        try:
            spark._jvm.java.lang.Class.forName(cls)
            out[fmt] = True
        except Exception:
            out[fmt] = False
    return out


def read_lake(spark: SparkSession, fmt: str, path_or_table: str) -> DataFrame:
    """Read a Delta/Iceberg/Hudi table through its real connector."""
    if fmt not in _PROBE_CLASSES:
        raise ValueError(f"unknown lake format {fmt!r}; expected {sorted(_PROBE_CLASSES)}")
    if not available_lake_formats(spark).get(fmt):
        raise RuntimeError(
            f"the {fmt} connector jar is not on the Spark classpath; add it via "
            f"spark.jars.packages (e.g. delta-spark / iceberg-spark-runtime / "
            f"hudi-spark-bundle) to read {path_or_table!r}. For append-only "
            f"Delta tables, read_lake_fallback can scan the raw parquet."
        )
    return spark.read.format(fmt).load(path_or_table)


def read_lake_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Raw-parquet scan of a Delta-layout directory (data files live
    next to _delta_log/). ONLY valid for append-only tables: deletes,
    updates, or OPTIMIZE leave stale files that this scan would
    double-count — the transaction log exists precisely to filter
    them, which needs the real connector."""
    return spark.read.parquet(path)
