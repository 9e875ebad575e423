"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; Spark's partial/final agg and
DuckDB's parallel agg sum in different orders, so raw double sums never
hash-match. The reference sidesteps this the same way we do for its
Decimal types: exact fixed-point accumulation
(/root/reference/src/AggregateFunctions/AggregateFunctionSum.h via
Decimal columns, src/Core/DecimalFunctions.h).

Convention used by every query in this engine AND its DuckDB oracle:

    sum(double x)  ->  CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)
    avg(double x)  ->  sum_decimal(x) / CAST(COUNT(x) AS DOUBLE)

The per-row double->decimal cast is deterministic (round-half-up at 6
fractional digits; binary doubles essentially never tie), the decimal
sum is exact (order-independent), and decimal->double is IEEE-defined —
so both engines emit bitwise-identical doubles. At 100 TB scale decimal
aggregation is still a single-pass partial/final hash agg; cost is ~2x
a raw double sum, paid only where oracle-exactness matters.

Decimal->double caveat: the JVM converts via BigDecimal.doubleValue()
(correctly rounded), while DuckDB divides the int128 payload by 10^scale
in double (two roundings -> occasionally 1 ulp off). The oracle SQL
therefore routes the final cast through VARCHAR — exact digits, then a
correctly-rounded strtod — which matches the JVM bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25 integer+fraction digits holds |x| < 1e19 at 6dp; sums widen to
# DECIMAL(35,6) in Spark / DECIMAL(38,6) in DuckDB without overflow.
_DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent double sum (exact decimal accumulation)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent double mean: decimal sum / count of non-nulls."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c).cast("double")
    return out.alias(alias) if alias else out


def dec_to_double_sql(expr: str) -> str:
    """Decimal->double in DuckDB, bitwise-matching the JVM (via VARCHAR)."""
    return f"CAST(CAST(({expr}) AS STRING) AS DOUBLE)"


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB-side spelling of :func:`dsum` (identical semantics)."""
    return f"{dec_to_double_sql(f'SUM(CAST({expr} AS DECIMAL(25,6)))')} AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    """DuckDB-side spelling of :func:`davg`."""
    return (
        f"{dec_to_double_sql(f'SUM(CAST({expr} AS DECIMAL(25,6)))')}"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )
