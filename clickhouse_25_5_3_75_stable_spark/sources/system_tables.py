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


def system_databases(spark: SparkSession) -> DataFrame:
    """system.databases (reference StorageSystemDatabases.cpp): the
    Spark catalog's database list."""
    rows = [(d.name, d.locationUri or "") for d in spark.catalog.listDatabases()]
    return spark.createDataFrame(rows, "name string, data_path string")


def system_data_type_families(spark: SparkSession) -> DataFrame:
    """system.data_type_families (reference
    StorageSystemDataTypeFamilies.cpp): every ClickHouse type name the
    engine's type map resolves, with case sensitivity and the Spark
    type it maps to in 'exact' mode."""
    from clickhouse_25_5_3_75_stable_spark.functions.typemap import (
        _SCALARS,
        ch_type_to_spark,
    )

    canonical = {
        "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
        "int128": "Int128", "int256": "Int256", "uint8": "UInt8",
        "uint16": "UInt16", "uint32": "UInt32", "uint64": "UInt64",
        "uint128": "UInt128", "uint256": "UInt256", "float32": "Float32",
        "float64": "Float64", "bfloat16": "BFloat16", "bool": "Bool",
        "string": "String", "date": "Date", "date32": "Date32",
        "datetime": "DateTime", "datetime32": "DateTime32", "uuid": "UUID",
        "ipv4": "IPv4", "ipv6": "IPv6", "json": "JSON", "dynamic": "Dynamic",
        "nothing": "Nothing",
    }
    rows = [
        (canonical.get(name, name), 1, _SCALARS[name][0])
        for name in sorted(_SCALARS)
    ]
    for comp in ("Array(Int64)", "Tuple(Int64, String)", "Map(String, Int64)",
                 "Nullable(Int64)", "LowCardinality(String)"):
        rows.append((comp.split("(")[0], 1, ch_type_to_spark(comp)))
    return spark.createDataFrame(
        rows, "name string, case_sensitive int, spark_type string"
    )


def system_formats(spark: SparkSession) -> DataFrame:
    """system.formats (reference StorageSystemFormats.cpp): format name
    + is_input/is_output flags for every format the engine reads or
    writes, plus excluded reference formats with their reasons."""
    from clickhouse_25_5_3_75_stable_spark.sources.formats_extra import (
        FORMAT_EXCLUSIONS,
    )

    native = [
        ("Parquet", 1, 1), ("ORC", 1, 1), ("CSV", 1, 1),
        ("CSVWithNames", 1, 1), ("TSV", 1, 1), ("TabSeparated", 1, 1),
        ("JSONEachRow", 1, 1), ("JSONLines", 1, 1), ("Avro", 1, 1),
        ("LineAsString", 1, 1), ("RawBLOB", 1, 1), ("XML", 1, 1),
        ("Arrow", 1, 1), ("ArrowStream", 1, 1), ("Npy", 1, 1),
        ("Regexp", 1, 0), ("Values", 1, 0), ("RowBinary", 1, 1),
        ("Native", 1, 1), ("Pretty", 0, 1), ("Vertical", 0, 1),
        # round 3: MsgPack implemented from the public spec
        ("MsgPack", 1, 1),
        # round 5: BSON/Template/Avro-shim + the long-tail batch
        # (sources/formats_longtail.py)
        ("BSONEachRow", 1, 1), ("Template", 1, 1),
        ("CustomSeparated", 1, 1), ("TSKV", 1, 1),
        ("JSONAsString", 1, 0), ("JSONCompactEachRow", 1, 1),
        ("JSONCompact", 1, 0), ("JSONColumns", 1, 0),
        ("JSONCompactColumns", 1, 0), ("JSONObjectEachRow", 1, 0),
        ("HiveText", 1, 1), ("One", 1, 0), ("Form", 1, 0),
        ("Null", 0, 1), ("Markdown", 0, 1), ("SQLInsert", 0, 1),
        ("ParquetMetadata", 1, 0),
    ]
    rows = [(n, i, o, None) for n, i, o in native]
    # Protobuf is honest about the classpath: supported when the
    # spark-protobuf jar is loadable, excluded-with-reason otherwise
    # (review finding: an unconditional is_input=1 row pointed users
    # at a NotImplementedError)
    from clickhouse_25_5_3_75_stable_spark.sources.protobuf_shim import (
        protobuf_available,
    )

    if protobuf_available(spark):
        rows += [("Protobuf", 1, 1, None), ("ProtobufSingle", 1, 0, None)]
    else:
        why = "spark-protobuf jar not on the classpath (sources/protobuf_shim.py has the recipe)"
        rows += [("Protobuf", 0, 0, why), ("ProtobufSingle", 0, 0, why)]
    rows += [(n, 0, 0, why) for n, why in sorted(FORMAT_EXCLUSIONS.items())]
    return spark.createDataFrame(
        rows, "name string, is_input int, is_output int, exclusion_reason string"
    )


def system_table_functions(spark: SparkSession) -> DataFrame:
    """system.table_functions (reference
    StorageSystemTableFunctions.cpp): introspected from the
    table_functions module."""
    import inspect

    from clickhouse_25_5_3_75_stable_spark.sources import table_functions as tf

    rows = [
        (name,)
        for name, fn in inspect.getmembers(tf, inspect.isfunction)
        if not name.startswith("_") and fn.__module__ == tf.__name__
    ]
    return spark.createDataFrame(rows, "name string")


def system_aggregate_function_combinators(spark: SparkSession) -> DataFrame:
    """system.aggregate_function_combinators (reference
    StorageSystemAggregateFunctionCombinators.cpp): the combinator
    suffixes the engine's aggregate layer supports."""
    rows = [
        ("-If", 0), ("-Array", 0), ("-Map", 0), ("-ForEach", 0),
        ("-Resample", 0), ("-State", 0), ("-Merge", 0), ("-Distinct", 0),
        ("-OrNull", 0), ("-SimpleState", 1), ("-MergeState", 1),
    ]
    return spark.createDataFrame(rows, "name string, is_internal int")


def system_collations(spark: SparkSession) -> DataFrame:
    """system.collations (reference StorageSystemCollations.cpp): the
    collation names ORDER BY ... COLLATE accepts — engine aliases plus
    the Spark 4 natives they resolve to."""
    from clickhouse_25_5_3_75_stable_spark.operators.collation import _ALIASES

    rows = [(alias, native) for alias, native in sorted(_ALIASES.items())]
    rows += [(n, n) for n in ("UTF8_BINARY", "UTF8_LCASE", "UNICODE",
                              "UNICODE_CI", "UNICODE_AI", "UNICODE_CI_AI")]
    return spark.createDataFrame(rows, "name string, resolves_to string")


def system_time_zones(spark: SparkSession) -> DataFrame:
    """system.time_zones (reference StorageSystemTimeZones.cpp): the
    IANA zone names available to toTimeZone()/convert_timezone."""
    import zoneinfo

    rows = [(z,) for z in sorted(zoneinfo.available_timezones())]
    return spark.createDataFrame(rows, "time_zone string")


def system_detached_parts(spark: SparkSession, layout_dir: str) -> DataFrame:
    """system.detached_parts (reference StorageSystemDetachedParts.cpp):
    partitions moved aside by ALTER TABLE ... DETACH PARTITION (the
    layout's _detached directory) — filesystem metadata only."""
    import os

    rows = []
    det = os.path.join(layout_dir, "_detached")
    if os.path.isdir(det):
        for part in sorted(os.listdir(det)):
            p = os.path.join(det, part)
            if not os.path.isdir(p):
                continue
            files = [f for f in os.listdir(p) if f.endswith(".parquet")]
            size = sum(os.path.getsize(os.path.join(p, f)) for f in files)
            rows.append((part, len(files), size))
    return spark.createDataFrame(
        rows, "partition string, n_files int, bytes_on_disk long"
    )


def system_parts_columns(spark: SparkSession, layout_dir: str) -> DataFrame:
    """system.parts_columns (reference StorageSystemPartsColumns.cpp):
    per-partition per-column min/max/null-count from parquet footers —
    the statistics MergeTree keeps per part, read without scanning
    data. Footer reads are O(parts), driver-side, same as the
    reference's metadata path."""
    import os

    import pyarrow.parquet as pq

    rows = []
    for part in sorted(os.listdir(layout_dir)):
        p = os.path.join(layout_dir, part)
        if not os.path.isdir(p) or part.startswith("_"):
            continue
        for fname in sorted(os.listdir(p)):
            if not fname.endswith(".parquet"):
                continue
            meta = pq.read_metadata(os.path.join(p, fname))
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    st = col.statistics
                    rows.append((
                        part,
                        fname,
                        rg,
                        col.path_in_schema,
                        str(st.min) if st and st.has_min_max else None,
                        str(st.max) if st and st.has_min_max else None,
                        int(st.null_count) if st and st.null_count is not None else None,
                    ))
    return spark.createDataFrame(
        rows,
        "partition string, file string, row_group int, column string, "
        "min_value string, max_value string, null_count long",
    )


def system_disks(spark: SparkSession, path: str = "/") -> DataFrame:
    """system.disks (reference StorageSystemDisks.cpp): free/total
    bytes of the storage path."""
    import shutil

    u = shutil.disk_usage(path)
    return spark.createDataFrame(
        [("default", path, u.free, u.total)],
        "name string, path string, free_space long, total_space long",
    )


def system_clusters(spark: SparkSession) -> DataFrame:
    """system.clusters (reference StorageSystemClusters.cpp): one row
    per executor of the live Spark application (local mode: the driver
    doubles as the single executor)."""
    sc = spark.sparkContext
    try:  # executor list via the JVM status tracker (cluster mode)
        infos = sc._jsc.sc().statusTracker().getExecutorInfos()
        rows = [
            ("default", i + 1, e.host(), int(e.numRunningTasks()))
            for i, e in enumerate(infos)
        ]
    except Exception:  # local fallback: the driver is the one executor
        rows = [("default", 1, sc.master, 0)]
    return spark.createDataFrame(
        rows, "cluster string, shard_num int, host_name string, running_tasks int"
    )


def system_build_options(spark: SparkSession) -> DataFrame:
    """system.build_options (reference StorageSystemBuildOptions.cpp):
    engine build/runtime identity."""
    import platform
    import sys

    import pyspark

    rows = [
        ("SPARK_VERSION", pyspark.__version__),
        ("PYTHON_VERSION", sys.version.split()[0]),
        ("PLATFORM", platform.platform()),
        ("REFERENCE", "ClickHouse-25.5.3.75-stable"),
    ]
    return spark.createDataFrame(rows, "name string, value string")


def system_processes(spark: SparkSession) -> DataFrame:
    """system.processes (reference StorageSystemProcesses.cpp): the
    Spark scheduler's currently-active jobs."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    rows = []
    for jid in tracker.getActiveJobsIds():
        info = tracker.getJobInfo(jid)
        if info:
            rows.append((int(jid), str(info.status), len(info.stageIds)))
    return spark.createDataFrame(rows, "job_id int, status string, n_stages int")
