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
