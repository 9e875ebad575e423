"""Dictionary lookups: dictGet / dictHas as broadcast joins
(SURVEY §1.1 / §2.8).

Reference: external dictionaries are in-memory key→attribute tables
with flat/hashed/cache layouts
(/root/reference/src/Dictionaries/registerDictionaries.cpp:30-65),
queried via dictGet*/dictHas
(/root/reference/src/Functions/FunctionsExternalDictionaries.h).

Spark mapping: a dictionary IS a broadcast DataFrame; dictGet is a
broadcast-hash-join projection — no shuffle of the fact side, the
build side ships once per executor, exactly the reference's DirectJoin
(/root/reference/src/Interpreters/DirectJoin.h:19). For dictionaries
too big to broadcast, drop `broadcast=` and let AQE pick a shuffle
join (≈ the reference's hashed layout spilling to a real join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Dictionary:
    """A keyed lookup table with dictGet/dictHas semantics."""

    def __init__(self, source: DataFrame, key: str, broadcast: bool = True):
        self.key = key
        self.source = source
        self.broadcast = broadcast

    def dict_get(
        self,
        facts: DataFrame,
        key_expr: Column,
        attrs: dict[str, str],
        defaults: dict[str, Column] | None = None,
    ) -> DataFrame:
        """Adds one column per attrs[out_name] = dict_attr; missing keys
        take defaults (dictGetOrDefault) or NULL (dictGetOrNull)."""
        lookup = self.source.select(
            F.col(self.key).alias("__dict_key"),
            *[F.col(a).alias(f"__dict_{out}") for out, a in attrs.items()],
        )
        if self.broadcast:
            lookup = F.broadcast(lookup)
        joined = facts.join(lookup, key_expr == F.col("__dict_key"), "left")
        for out in attrs:
            col = F.col(f"__dict_{out}")
            if defaults and out in defaults:
                col = F.coalesce(col, defaults[out])
            joined = joined.withColumn(out, col)
        return joined.drop("__dict_key", *[f"__dict_{out}" for out in attrs])

    def dict_has(self, facts: DataFrame, key_expr: Column, out: str = "has") -> DataFrame:
        lookup = self.source.select(F.col(self.key).alias("__dict_key")).distinct()
        if self.broadcast:
            lookup = F.broadcast(lookup)
        joined = facts.join(lookup, key_expr == F.col("__dict_key"), "left")
        return joined.withColumn(out, F.col("__dict_key").isNotNull()).drop("__dict_key")


class RangeDictionary:
    """range_hashed layout: key + [range_start, range_end) validity
    intervals (reference RangeHashedDictionary,
    /root/reference/src/Dictionaries/registerDictionaries.cpp:38 and
    RangeHashedDictionary.h): ``dictGet(d, attr, key, point)`` returns
    the attribute row whose interval contains the query point.

    Spark mapping: broadcast range join — equi-join on the key plus an
    interval predicate. Catalyst executes broadcast-hash on the key
    with the range residual as a post-filter, so the fact side never
    shuffles. Overlapping intervals resolve to the LATEST start (the
    reference picks by range order); ties broken deterministically."""

    def __init__(
        self,
        source: DataFrame,
        key: str,
        range_start: str,
        range_end: str,
        broadcast: bool = True,
    ):
        self.source = source
        self.key = key
        self.start = range_start
        self.end = range_end
        self.broadcast = broadcast

    def dict_get(
        self,
        facts: DataFrame,
        key_expr: Column,
        point_expr: Column,
        attrs: dict[str, str],
    ) -> DataFrame:
        lookup = self.source.select(
            F.col(self.key).alias("__rd_key"),
            F.col(self.start).alias("__rd_lo"),
            F.col(self.end).alias("__rd_hi"),
            *[F.col(a).alias(f"__rd_{out}") for out, a in attrs.items()],
        )
        if self.broadcast:
            lookup = F.broadcast(lookup)
        # Tag every fact with a unique row id BEFORE the join: the
        # overlap-dedup window must partition on row identity, not on
        # the fact's column values — otherwise two identical input rows
        # collapse to one (dictGet is strictly row-preserving).
        tagged = (
            facts.withColumn("__rd_rowid", F.monotonically_increasing_id())
            .withColumn("__rd_point", point_expr)
            .withColumn("__rd_fact_key", key_expr)
        )
        joined = tagged.join(
            lookup,
            (F.col("__rd_fact_key") == F.col("__rd_key"))
            & (F.col("__rd_point") >= F.col("__rd_lo"))
            & (F.col("__rd_point") < F.col("__rd_hi")),
            "left",
        )
        # overlapping intervals: keep the match with the latest start
        from pyspark.sql.window import Window

        w = Window.partitionBy("__rd_rowid").orderBy(F.desc_nulls_last("__rd_lo"))
        deduped = (
            joined.withColumn("__rd_rn", F.row_number().over(w))
            .filter(F.col("__rd_rn") == 1)
            .drop(
                "__rd_rn",
                "__rd_rowid",
                "__rd_key",
                "__rd_lo",
                "__rd_hi",
                "__rd_point",
                "__rd_fact_key",
            )
        )
        out = deduped
        for o in attrs:
            out = out.withColumnRenamed(f"__rd_{o}", o)
        return out
