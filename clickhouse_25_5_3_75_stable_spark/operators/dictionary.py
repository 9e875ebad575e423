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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# named-dictionary registry serving system.dictionaries
# (/root/reference/src/Storages/System/StorageSystemDictionaries.cpp):
# a dictionary registers on construction when given a name; the system
# table reflects the LIVE objects (layout, key, attributes, row count)
DICTIONARY_REGISTRY: dict[str, object] = {}


def _register_dict(d, name: str | None) -> None:
    if name:
        d.name = name
        DICTIONARY_REGISTRY[name] = d


class Dictionary:
    """A keyed lookup table with dictGet/dictHas semantics."""

    layout = "hashed"

    def __init__(self, source: DataFrame, key: str, broadcast: bool = True,
                 name: str | None = None):
        self.key = key
        self.source = source
        self.broadcast = broadcast
        _register_dict(self, name)

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

    layout = "range_hashed"

    def __init__(
        self,
        source: DataFrame,
        key: str,
        range_start: str,
        range_end: str,
        broadcast: bool = True,
        name: str | None = None,
    ):
        self.source = source
        self.key = key
        self.start = range_start
        self.end = range_end
        self.broadcast = broadcast
        _register_dict(self, name)

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


def _ip_bits_py(s: pd.Series) -> pd.Series:
    """Canonicalize an IPv4/IPv6 address string to a 128-char '0'/'1'
    bit string. IPv4 maps into ::ffff:0:0/96 exactly as the reference
    trie stores IPv4 inside the IPv6 keyspace
    (/root/reference/src/Dictionaries/IPAddressDictionary.cpp). Unparseable
    or NULL input -> NULL (dictGet then takes the default)."""
    import ipaddress

    def conv(v):
        if v is None:
            return None
        try:
            a = ipaddress.ip_address(v.strip())
        except ValueError:
            return None
        n = int(a)
        if a.version == 4:
            n |= 0xFFFF << 32
        return format(n, "0128b")

    return s.map(conv)


def _ip_bits(col: Column) -> Column:
    # pandas_udf parses its return type against the active session, so
    # the wrapper is built per call, not at import time
    return pandas_udf(_ip_bits_py, "string")(col)


class IPTrieDictionary:
    """ip_trie layout (reference IPAddressDictionary, registered at
    /root/reference/src/Dictionaries/registerDictionaries.cpp:47): keys
    are CIDR prefixes; ``dictGet`` resolves an address to the attributes
    of the LONGEST matching prefix (trie descent in the reference).

    Spark mapping: both sides canonicalize to 128-bit binary strings
    (IPv4-mapped-IPv6, like the reference's single trie). The dictionary
    groups by prefix length; the fact side takes ONE broadcast-hash join
    per DISTINCT prefix length present in the dictionary (<=129, in
    practice a handful) on ``substring(bits, 1, len)`` equality, and the
    final attribute is a ``coalesce`` over the joins in descending
    length order — longest-prefix-wins with NO shuffle of the fact side
    and no row explosion. The only driver-side collect is the distinct
    prefix-length set (bounded metadata, never data)."""

    layout = "ip_trie"

    def __init__(self, source: DataFrame, cidr: str, name: str | None = None):
        self.source = source
        self.cidr = cidr
        self.key = cidr
        _register_dict(self, name)

    def dict_get(
        self,
        facts: DataFrame,
        addr_expr: Column,
        attrs: dict[str, str],
        defaults: dict[str, Column] | None = None,
    ) -> DataFrame:
        cidr = F.col(self.cidr)
        net = F.substring_index(cidr, "/", 1)
        # try_cast: a missing '/' or junk length must surface as the
        # unparseable-CIDR refusal below, not an ANSI cast exception
        plen_raw = F.when(
            cidr.contains("/"),
            F.substring_index(cidr, "/", -1).try_cast("int"),
        )
        # IPv4 prefixes live 96 bits deep in the v6 keyspace
        plen = F.when(net.contains(":"), plen_raw).otherwise(plen_raw + 96)
        lookup = self.source.select(
            cidr.alias("__ipt_cidr"),
            plen.alias("__ipt_len"),
            F.substring(_ip_bits(net), 1, plen).alias("__ipt_prefix"),
            *[F.col(a).alias(f"__ipt_{out}") for out, a in attrs.items()],
        )
        # Refuse malformed and duplicate CIDR keys up front (dictionary
        # side only): a missing '/' would otherwise crash the length
        # sort with a NULL, and a duplicate prefix would silently
        # multiply fact rows (dictGet is strictly row-preserving —
        # review-found). ONE aggregation pass, memoized per instance —
        # the source is immutable, so repeated dictGet calls must not
        # re-pay the validation job (review-found).
        if not getattr(self, "_validated", False):
            probe = (
                lookup.groupBy("__ipt_len", "__ipt_prefix")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.min("__ipt_cidr").alias("cidr"))
                .filter(
                    F.col("__ipt_len").isNull()
                    | F.col("__ipt_prefix").isNull()
                    | (F.col("n") > 1)
                )
                .limit(1)
                .collect()
            )
            if probe:
                r = probe[0]
                if r["__ipt_len"] is None or r["__ipt_prefix"] is None:
                    raise ValueError(
                        f"ip_trie dictionary: unparseable CIDR key "
                        f"{r['cidr']!r} (want address/prefixlen)")
                raise ValueError(
                    f"ip_trie dictionary: duplicate CIDR key {r['cidr']!r}")
            self._validated = True
        lookup = lookup.drop("__ipt_cidr")
        lens = sorted(
            (r[0] for r in lookup.select("__ipt_len").distinct().collect()),
            reverse=True,
        )
        out = facts.withColumn("__ipt_bits", _ip_bits(addr_expr))
        for ln in lens:
            side = F.broadcast(
                lookup.filter(F.col("__ipt_len") == ln).select(
                    F.col("__ipt_prefix").alias(f"__p{ln}"),
                    *[
                        F.col(f"__ipt_{o}").alias(f"__a{ln}_{o}")
                        for o in attrs
                    ],
                )
            )
            out = out.join(
                side,
                F.substring(F.col("__ipt_bits"), 1, ln) == F.col(f"__p{ln}"),
                "left",
            ).drop(f"__p{ln}")
        for o in attrs:
            cands = [F.col(f"__a{ln}_{o}") for ln in lens]
            if defaults and o in defaults:
                cands.append(defaults[o])
            out = out.withColumn(o, F.coalesce(*cands) if cands else F.lit(None))
        return out.drop(
            "__ipt_bits", *[f"__a{ln}_{o}" for ln in lens for o in attrs]
        )


def _point_in_ring(px: Column, py: Column, verts: Column) -> Column:
    """Ray-cast parity test against an array<struct<x,y>> ring column —
    pure JVM higher-order functions, works for arbitrary simple
    polygons (the literal-vertex pointInPolygon in functions/dialect.py
    is convex-only). Half-open edge convention; boundary points are not
    guaranteed either way (the reference delegates to boost::geometry
    with the same caveat for `within`)."""
    n = F.size(verts)
    nxt = F.concat(F.slice(verts, 2, n - 1), F.slice(verts, 1, 1))
    edges = F.arrays_zip(verts.alias("a"), nxt.alias("b"))
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["a"]["y"] > py) != (e["b"]["y"] > py))
            & (
                px
                < (e["b"]["x"] - e["a"]["x"])
                * (py - e["a"]["y"])
                / (e["b"]["y"] - e["a"]["y"])
                + e["a"]["x"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


class PolygonDictionary:
    """polygon layout (reference PolygonDictionarySimple, registered at
    /root/reference/src/Dictionaries/registerDictionaries.cpp +
    PolygonDictionaryImplementations.cpp): keys are polygons;
    ``dictGet`` finds the polygon containing a query point. Subset: one
    outer ring per polygon (no holes/multipolygon); overlapping
    polygons resolve DETERMINISTICALLY to the smallest key (the
    reference scans in storage order and takes the first hit).

    Spark mapping: polygons broadcast with precomputed bounding boxes;
    the join condition is bbox containment (cheap, prunes most pairs)
    AND the exact JVM ray-cast — a broadcast nested-loop join, the fact
    side never shuffles for the probe. The per-row overlap dedup uses
    the same row-identity window as RangeDictionary."""

    layout = "polygon"

    def __init__(self, source: DataFrame, key: str, vertices: str,
                 name: str | None = None):
        self.source = source
        self.key = key
        self.vertices = vertices
        _register_dict(self, name)

    def dict_get(
        self,
        facts: DataFrame,
        x_expr: Column,
        y_expr: Column,
        attrs: dict[str, str],
        defaults: dict[str, Column] | None = None,
    ) -> DataFrame:
        v = F.col(self.vertices)
        xs = F.transform(v, lambda p: p["x"])
        ys = F.transform(v, lambda p: p["y"])
        lookup = F.broadcast(
            self.source.select(
                F.col(self.key).alias("__pg_key"),
                v.alias("__pg_verts"),
                F.array_min(xs).alias("__pg_xmin"),
                F.array_max(xs).alias("__pg_xmax"),
                F.array_min(ys).alias("__pg_ymin"),
                F.array_max(ys).alias("__pg_ymax"),
                *[F.col(a).alias(f"__pg_{out}") for out, a in attrs.items()],
            )
        )
        tagged = (
            facts.withColumn("__pg_rowid", F.monotonically_increasing_id())
            .withColumn("__pg_x", x_expr)
            .withColumn("__pg_y", y_expr)
        )
        px, py = F.col("__pg_x"), F.col("__pg_y")
        joined = tagged.join(
            lookup,
            (px >= F.col("__pg_xmin"))
            & (px <= F.col("__pg_xmax"))
            & (py >= F.col("__pg_ymin"))
            & (py <= F.col("__pg_ymax"))
            & _point_in_ring(px, py, F.col("__pg_verts")),
            "left",
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("__pg_rowid").orderBy(F.asc_nulls_last("__pg_key"))
        out = (
            joined.withColumn("__pg_rn", F.row_number().over(w))
            .filter(F.col("__pg_rn") == 1)
            .drop(
                "__pg_rn", "__pg_rowid", "__pg_x", "__pg_y", "__pg_key",
                "__pg_verts", "__pg_xmin", "__pg_xmax", "__pg_ymin", "__pg_ymax",
            )
        )
        for o in attrs:
            col = F.col(f"__pg_{o}")
            if defaults and o in defaults:
                col = F.coalesce(col, defaults[o])
            out = out.withColumn(o, col).drop(f"__pg_{o}")
        return out
