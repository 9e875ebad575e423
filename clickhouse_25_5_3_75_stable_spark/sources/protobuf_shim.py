"""Protobuf format shim (SURVEY §2.1 format long tail).

Reference: Protobuf / ProtobufSingle / ProtobufList
(/root/reference/src/Processors/Formats/Impl/ProtobufRowInputFormat.cpp,
registerFormats.cpp:26-105) — rows encoded against a compiled message
descriptor, length-delimited (Protobuf) or one message per file
(ProtobufSingle).

Spark mapping: the official ``spark-protobuf`` connector —
``pyspark.sql.protobuf.functions.from_protobuf/to_protobuf`` over a
FileDescriptorSet path, which is the exact analogue of the reference's
``format_schema = 'file.proto:Message'`` contract. The connector jar is
NOT bundled with pip pyspark (same situation as spark-avro, see
tests/test_formats.py), so this module is a capability-gated surface:

- :func:`protobuf_available` probes the session classpath;
- :func:`read_protobuf`/:func:`write_protobuf` run the real connector
  when the jar is present and raise a clear, documented
  ``NotImplementedError`` (with the spark.jars recipe) when it is not.

The decode itself is JVM-side (no Python in the row path) once the jar
exists — at scale this is a plain columnar scan + deserialize."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

_JAR_HINT = (
    "spark-protobuf is not on the classpath. Launch with "
    "--packages org.apache.spark:spark-protobuf_2.13:<spark-version> "
    "(or add the jar via spark.jars); the API contract here mirrors the "
    "reference's format_schema='schema.desc:Message' exactly."
)


def protobuf_available(spark: SparkSession) -> bool:
    """True when the spark-protobuf connector classes are loadable.
    Resolves through Spark's own classloader utility first (review
    finding: a bare Class.forName checks only the system classloader
    and misses jars added via spark.jars/--packages, which land on
    Spark's MutableURLClassLoader)."""
    cls = "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(  # noqa: SLF001
            cls, False, False
        )
        return True
    except Exception:
        pass
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def from_protobuf_col(
    spark: SparkSession, data: Column, message_name: str, desc_file_path: str
) -> Column:
    """from_protobuf over a binary column + compiled FileDescriptorSet
    (`protoc --descriptor_set_out`). Raises with the jar recipe when
    the connector is absent."""
    if not protobuf_available(spark):
        raise NotImplementedError(_JAR_HINT)
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(data, message_name, descFilePath=desc_file_path)


def read_protobuf(
    spark: SparkSession,
    path_glob: str,
    message_name: str,
    desc_file_path: str,
    binary_col: str = "value",
) -> DataFrame:
    """FORMAT Protobuf input: binary payloads (one message per row —
    e.g. a Kafka value column or ProtobufSingle file dumps via
    binaryFile) decoded against the descriptor. JVM-side decode."""
    if not protobuf_available(spark):
        raise NotImplementedError(_JAR_HINT)
    from pyspark.sql import functions as F

    src = spark.read.format("binaryFile").load(path_glob)
    col = from_protobuf_col(spark, F.col("content"), message_name, desc_file_path)
    return src.select(col.alias("msg")).select("msg.*")


def write_protobuf(
    df: DataFrame,
    path: str,
    message_name: str,
    desc_file_path: str,
) -> None:
    """FORMAT Protobuf output: rows → one serialized message per row,
    stored as a binary column in parquet (the splittable carrier; raw
    length-delimited single-file dumps are not splittable anyway)."""
    spark = df.sparkSession
    if not protobuf_available(spark):
        raise NotImplementedError(_JAR_HINT)
    from pyspark.sql import functions as F
    from pyspark.sql.protobuf.functions import to_protobuf

    packed = df.select(
        to_protobuf(F.struct(*df.columns), message_name, descFilePath=desc_file_path).alias(
            "value"
        )
    )
    packed.write.mode("overwrite").parquet(path)
