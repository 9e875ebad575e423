from clickhouse_25_5_3_75_stable_spark.operators.joins import any_join, asof_join, paste_join
from clickhouse_25_5_3_75_stable_spark.operators.limits import distinct_on, limit_by, limit_with_ties
from clickhouse_25_5_3_75_stable_spark.operators.totals import with_totals

__all__ = [
    "any_join",
    "asof_join",
    "paste_join",
    "distinct_on",
    "limit_by",
    "limit_with_ties",
    "with_totals",
]
