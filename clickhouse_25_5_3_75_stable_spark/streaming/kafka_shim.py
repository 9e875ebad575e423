"""Kafka-shape streaming source (SURVEY §2.1 / §2.9).

Reference: StorageKafka (/root/reference/src/Storages/Kafka/
StorageKafka.h:37) — a Kafka topic surfaces as a streaming table whose
rows carry the payload plus the _topic/_partition/_offset/_timestamp
virtual columns, and a materialized view drains it continuously.

Spark mapping: `spark.readStream.format("kafka")` yields exactly that
schema (key, value: binary; topic, partition, offset, timestamp). The
sandbox has no Kafka broker or kafka-sql jar, so :func:`kafka_stream`
uses the real source when loadable and otherwise synthesizes the SAME
SCHEMA from the built-in rate source — every downstream query (JSON
value parsing, windowed aggregation, MV cascade) runs unchanged
against either. That closes the query-shape surface the reference
covers even where the broker can't exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    rows_per_second: int = 100,
    partitions: int = 4,
) -> DataFrame:
    """Streaming DataFrame in Kafka record shape. Real Kafka when the
    connector is on the classpath; rate-source shim otherwise (value =
    JSON payload {"k": id, "v": id*2} so parse-then-aggregate queries
    exercise the same plan)."""
    if kafka_available(spark):
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .load()
        )
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        F.col("value").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(F.col("value").alias("k"), (F.col("value") * 2).alias("v"))
        ).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("value"), F.lit(partitions)).cast("int").alias("partition"),
        F.col("value").alias("offset"),
        F.col("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def parse_json_value(stream: DataFrame, schema: str) -> DataFrame:
    """The standard first hop after a Kafka read: value bytes → typed
    columns (reference: Kafka engine + JSONEachRow format)."""
    return stream.select(
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.from_json(F.col("value").cast("string"), schema).alias("payload"),
    ).select("topic", "partition", "offset", "timestamp", "payload.*")
