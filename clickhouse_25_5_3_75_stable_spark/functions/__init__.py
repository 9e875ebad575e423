from clickhouse_25_5_3_75_stable_spark.functions.numeric import davg, dsum

__all__ = ["davg", "dsum"]
