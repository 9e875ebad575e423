"""PySpark-native analytics engine with the query & data-processing
capabilities of ClickHouse 25.5.3.75 (reference: /root/reference, fork
darion-yaphet/ClickHouse-25.5.3.75-stable).

NOT a port: the reference's C++ vectorized pipeline (src/Processors/*)
maps onto Spark's Tungsten/Catalyst execution; this package is the thin
Spark-first layer on top — session bootstrap, a parquet catalog, a
ClickHouse-dialect function registry, and DataFrame builders for the
operators Spark lacks natively (ASOF/ANY/PASTE joins, LIMIT BY, WITH
FILL, windowFunnel, MinHash dedup, vector top-k, ...).

Layout mirrors SURVEY.md §2:
  sources/    scans & catalog          (§2.1)
  functions/  scalar function dialect  (§2.8)
  operators/  joins/aggs/limits/dedup  (§2.3-2.7, LLM-pipeline ops)
  streaming/  windowed streaming       (§2.9)
  plans/      plan inspection helpers  (§4)
"""

from clickhouse_25_5_3_75_stable_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
