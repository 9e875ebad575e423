"""Scalar-function breadth, part 2 (SURVEY §2.8): multi-pattern string
search (reference /root/reference/src/Functions/multiMatchAny.cpp,
MultiSearchImpl.h, hasToken.cpp), IPv4 coding + CIDR membership
(FunctionsCodingIP.cpp, isIPAddressContainedIn.cpp), snowflake-ID
bit math (snowflakeIDToDateTime.cpp), human-readable formatting
(formatReadableSize.cpp), and geo (greatCircleDistance.cpp,
PolygonUtils.h). Every expression stays JVM-side via the ch() dialect
registry; oracles spell the identical math in DuckDB SQL.
Imported by queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch
from clickhouse_25_5_3_75_stable_spark.queries import register, t


@register(
    "func_search_family",
    oracle="""
    SELECT doc_id,
           instr(text, 'data') AS pos_data,
           text LIKE '%learning%' AS like_learning,
           lower(text) LIKE '%model%' AS ilike_model,
           NOT (text LIKE '%xyzzy%') AS notlike_xyzzy,
           regexp_matches(text, '[0-9]+') AS has_digits,
           (instr(text, 'data') > 0 OR instr(text, 'model') > 0
            OR instr(text, 'graph') > 0) AS multi_any,
           CASE WHEN instr(text, 'data') > 0 THEN 1
                WHEN instr(text, 'model') > 0 THEN 2
                WHEN instr(text, 'graph') > 0 THEN 3
                ELSE 0 END AS first_idx,
           regexp_matches(text,
             '(^|[\\x00-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7f])the([\\x00-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7f]|$)') AS has_the,
           length(regexp_split_to_array(text, 'data')) - 1 AS n_data,
           CAST(len(regexp_extract_all(text, '[a-z]+ing')) AS INTEGER) AS n_ing
    FROM documents
    ORDER BY doc_id
    """,
    tags=("functions", "search"),
)
def func_search_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-search family: position / like / ilike / notLike / match
    / multiSearchAny / multiSearchFirstIndex / hasToken /
    countSubstrings / extractAll-count."""
    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    return d.select(
        "doc_id",
        ch("position", txt, "data").alias("pos_data"),
        ch("like", txt, "%learning%").alias("like_learning"),
        ch("ilike", txt, "%model%").alias("ilike_model"),
        ch("notLike", txt, "%xyzzy%").alias("notlike_xyzzy"),
        ch("match", txt, "[0-9]+").alias("has_digits"),
        ch("multiSearchAny", txt, ["data", "model", "graph"]).alias("multi_any"),
        ch("multiSearchFirstIndex", txt, ["data", "model", "graph"]).alias("first_idx"),
        ch("hasToken", txt, "the").alias("has_the"),
        ch("countSubstrings", txt, "data").alias("n_data"),
        F.size(ch("extractAll", txt, "[a-z]+ing")).alias("n_ing"),
    ).orderBy("doc_id")


@register(
    "func_ip_family",
    oracle="""
    WITH ips AS (
        SELECT user_id,
               ((10 * 16777216) + (user_id % 16777216)) AS ip_num
        FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT user_id, ip_num,
           printf('%d.%d.%d.%d',
                  CAST(floor(ip_num / 16777216) AS BIGINT) % 256,
                  CAST(floor(ip_num / 65536) AS BIGINT) % 256,
                  CAST(floor(ip_num / 256) AS BIGINT) % 256,
                  ip_num % 256) AS ip_str,
           (CAST(floor(ip_num / 16777216) AS BIGINT) % 256) = 10 AS in_10_8,
           (CAST(floor(ip_num / 65536) AS BIGINT) % 65536) = 2560 AS in_10_0_16
    FROM ips
    ORDER BY user_id
    """,
    tags=("functions", "ip"),
)
def func_ip_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 num<->string round-trip + CIDR membership over synthetic
    10.x.y.z addresses derived from user_id (integer bit math — exact)."""
    ev = t(spark, sf_dir, "events").select("user_id").distinct()
    ip_num = (F.lit(10) * 16777216 + F.col("user_id") % 16777216).cast("bigint")
    d = ev.select("user_id", ip_num.alias("ip_num"))
    ip_str = ch("IPv4NumToString", F.col("ip_num"))
    return d.select(
        "user_id",
        "ip_num",
        ip_str.alias("ip_str"),
        ch("isIPAddressInRange", ip_str, "10.0.0.0/8").alias("in_10_8"),
        ch("isIPAddressInRange", ip_str, "10.0.0.0/16").alias("in_10_0_16"),
    ).orderBy("user_id")


@register(
    "func_snowflake_readable_family",
    oracle="""
    SELECT event_id,
           (event_id * 4194304) AS snow_id,
           epoch_ms(event_id + 1288834974657) AS snow_ts,
           CASE WHEN CAST(event_id * 131072 AS DOUBLE) >= 1073741824.0
                THEN printf('%.2f GiB', floor(CAST(event_id * 131072 AS DOUBLE)
                                              / 1073741824.0 * 100) / 100)
                WHEN CAST(event_id * 131072 AS DOUBLE) >= 1048576.0
                THEN printf('%.2f MiB', floor(CAST(event_id * 131072 AS DOUBLE)
                                              / 1048576.0 * 100) / 100)
                WHEN CAST(event_id * 131072 AS DOUBLE) >= 1024.0
                THEN printf('%.2f KiB', floor(CAST(event_id * 131072 AS DOUBLE)
                                              / 1024.0 * 100) / 100)
                ELSE printf('%.2f B', floor(CAST(event_id * 131072 AS DOUBLE) * 100) / 100)
           END AS readable_size
    FROM events
    ORDER BY event_id
    """,
    tags=("functions", "snowflake"),
)
def func_snowflake_readable_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snowflakeIDToDateTime bit math (epoch 1288834974657 ms) +
    formatReadableSize with floor-at-2dp so both engines print the same
    exact double."""
    ev = t(spark, sf_dir, "events")
    snow_id = (F.col("event_id") * 4194304).cast("bigint")  # event_id << 22
    nbytes = (F.col("event_id") * 131072).cast("bigint")
    return ev.select(
        "event_id",
        snow_id.alias("snow_id"),
        ch("snowflakeIDToDateTime", snow_id).alias("snow_ts"),
        ch("formatReadableSize", nbytes).alias("readable_size"),
    ).orderBy("event_id")


# Convex diamond centered at (-110, -10), radius 20, counterclockwise
# (so interior cross-products are >= 0); covers part of the synthetic
# point line lon = user_id - 179.5, lat = user_id - 84.5.
_DIAMOND = [(-130.0, -10.0), (-110.0, -30.0), (-90.0, -10.0), (-110.0, 10.0)]


def _polygon_sql(px: str, py: str, vertices) -> str:
    """The exact cross-product conjunction pointInPolygon uses, spelled
    in SQL so the oracle computes the identical formula."""
    conds = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        conds.append(
            f"(({x2} - {x1}) * ({py} - {y1}) - ({y2} - {y1}) * ({px} - {x1}) >= 0)"
        )
    return " AND ".join(conds)


@register(
    "func_geo_family",
    oracle=f"""
    WITH pts AS (
        SELECT user_id,
               CAST(user_id % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
               CAST(user_id % 170 AS DOUBLE) - 85.0 + 0.5 AS lat
        FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT user_id,
           round(2.0 * 6371000.0 * asin(sqrt(
               sin(radians(lat) / 2) * sin(radians(lat) / 2)
               + cos(radians(0.0)) * cos(radians(lat))
                 * sin(radians(lon) / 2) * sin(radians(lon) / 2)
           )) / 1000.0, 3) AS dist_km,
           {_polygon_sql('lon', 'lat', _DIAMOND)} AS in_box
    FROM pts
    ORDER BY user_id
    """,
    tags=("functions", "geo"),
)
def func_geo_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatCircleDistance (haversine, rounded to 3 dp of km to absorb
    last-ulp libm differences) + pointInPolygon on a convex diamond
    (cross-product signs — exact)."""
    ev = t(spark, sf_dir, "events").select("user_id").distinct()
    lon = (F.col("user_id") % 360).cast("double") - 180.0 + 0.5
    lat = (F.col("user_id") % 170).cast("double") - 85.0 + 0.5
    d = ev.select("user_id", lon.alias("lon"), lat.alias("lat"))
    return d.select(
        "user_id",
        F.round(
            ch("greatCircleDistance", F.lit(0.0), F.lit(0.0), F.col("lon"), F.col("lat"))
            / 1000.0,
            3,
        ).alias("dist_km"),
        ch("pointInPolygon", F.col("lon"), F.col("lat"), _DIAMOND).alias("in_box"),
    ).orderBy("user_id")
