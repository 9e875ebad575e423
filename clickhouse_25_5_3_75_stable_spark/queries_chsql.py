"""Driver-contract queries that run through the ClickHouse-SQL shim
(chsql.py) — proving the SQL front door end-to-end: the query text is
ClickHouse dialect (PREWHERE, LIMIT..BY, QUALIFY, countIf, toYear,
multiIf, FORMAT suffix — reference
/root/reference/src/Parsers/ParserSelectQuery.cpp), executed by Spark
after transpilation, hash-checked against a hand-written ANSI oracle.
Imported by queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.chsql import ch_sql
from clickhouse_25_5_3_75_stable_spark.queries import register, t


@register(
    "chsql_prewhere_yearly",
    # Both sides cast y/nf to one explicit BIGINT: DuckDB EXTRACT(year)
    # returns BIGINT where Spark year() is INT, and DuckDB SUM(CASE..)
    # widens to HUGEINT where Spark stays BIGINT — the driver's row
    # hash is dtype-sensitive (round-3 red), so the boundary dtype is
    # pinned explicitly on both engines.
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS nf,
           MIN(CASE WHEN o_orderkey > 0 THEN o_orderkey END) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE o_totalprice > 1000 AND o_orderkey % 2 = 0
    GROUP BY y
    ORDER BY y
    """,
    tags=("chsql", "prewhere"),
)
def chsql_prewhere_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREWHERE + countIf + toYear + FORMAT suffix, in ClickHouse SQL
    text. The shim folds PREWHERE into WHERE — Spark's parquet
    pushdown then gives the same early-filter behavior the reference's
    MergeTreeWhereOptimizer provides."""
    out = ch_sql(
        spark,
        """
        SELECT toYear(o_orderdate) AS y,
               count() AS n,
               countIf(o_orderstatus == 'F') AS nf,
               minIf(o_orderkey, o_orderkey > 0) AS min_key,
               max(o_orderkey) AS max_key
        FROM orders
        PREWHERE o_totalprice > 1000
        WHERE o_orderkey % 2 = 0
        GROUP BY y
        ORDER BY y
        FORMAT TabSeparated
        """,
        sf_dir,
    )
    return out.withColumn("y", F.col("y").cast("bigint")).withColumn(
        "nf", F.col("nf").cast("bigint")
    )


@register(
    "chsql_limit_by_buckets",
    oracle="""
    WITH b AS (
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 200000 THEN 'mid'
                    ELSE 'high' END AS bucket,
               o_totalprice
        FROM orders
    ), ranked AS (
        SELECT o_orderkey, bucket, o_totalprice,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM b
    )
    SELECT o_orderkey, bucket, o_totalprice
    FROM ranked WHERE rn <= 3
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    tags=("chsql", "limit_by"),
)
def chsql_limit_by_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT 3 BY bucket + multiIf, in ClickHouse SQL text — the shim
    rewrites to a row_number window over the price buckets (reference
    LimitByStep.h:8 semantics: top-n rows per distinct key set)."""
    return ch_sql(
        spark,
        """
        SELECT o_orderkey,
               multiIf(o_totalprice < 50000, 'low',
                       o_totalprice < 200000, 'mid', 'high') AS bucket,
               o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 3 BY bucket
        """,
        sf_dir,
    )


@register(
    "chsql_multi_array_join_collate",
    # lockstep multi-ARRAY JOIN: token i of the name pairs with index
    # i; final order is case-insensitive on the token
    oracle="""
    WITH toks AS (
        SELECT n_nationkey,
               unnest(string_split(n_name, ' ')) AS tok,
               generate_subscripts(string_split(n_name, ' '), 1) AS idx
        FROM nation
    )
    SELECT n_nationkey, tok, CAST(idx - 1 AS BIGINT) AS idx
    FROM toks
    ORDER BY lower(tok), tok, n_nationkey
    """,
    tags=("chsql", "array_join", "collate"),
)
def chsql_multi_array_join_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-array ARRAY JOIN (lockstep zip, reference
    ArrayJoinStep.h) + ORDER BY ... COLLATE, all in ClickHouse SQL
    text through the shim: tokens of each nation name joined with
    their positions, ordered case-insensitively."""
    out = ch_sql(
        spark,
        """
        SELECT n_nationkey, tok, idx1 - 1 AS idx
        FROM nation
        ARRAY JOIN splitByChar(' ', n_name) AS tok,
                   arrayEnumerate(splitByChar(' ', n_name)) AS idx1
        ORDER BY tok COLLATE 'en', tok, n_nationkey
        """,
        sf_dir,
    )
    # bigint: arrayEnumerate yields INT in Spark, the oracle pins BIGINT
    return out.withColumn("idx", F.col("idx").cast("bigint"))


@register(
    "chsql_ternary_array_tuple",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 25 THEN 'high' ELSE 'low' END AS qty_band,
           CAST(6 * l_quantity AS DOUBLE) AS weighted,
           CASE WHEN l_linenumber < 2 THEN 2
                WHEN l_linenumber < 4 THEN 4
                WHEN l_linenumber < 6 THEN 6 END AS first_gt,
           l_returnflag AS rf
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("chsql", "ternary", "array_literal", "tuple"),
)
def chsql_ternary_array_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 SQL-shim surface in one CH statement: C-style ternary,
    ``[...]`` array literals (1-based subscripts via try_element_at),
    lambda-first HOFs (arraySum/arrayFirst with the CH argument
    order), and positional tuple access — all transpiled, executed by
    Catalyst, and cross-checked against the closed-form oracle."""
    return ch_sql(
        spark,
        """
        SELECT l_orderkey, l_linenumber,
               l_quantity > 25 ? 'high' : 'low' AS qty_band,
               arraySum(x -> x * l_quantity, [1, 2, 3]) AS weighted,
               arrayFirst(x -> x > l_linenumber, [2, 4, 6]) AS first_gt,
               tuple(l_returnflag, l_linestatus).1 AS rf
        FROM lineitem
        WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber
        """,
        sf_dir,
    )


@register(
    "chsql_asof_sql_click_view",
    oracle="""
    WITH clicks AS (
        SELECT user_id AS uid, CAST(ts AS TIMESTAMP) AS cts, event_id AS cid
        FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id AS uid, CAST(ts AS TIMESTAMP) AS vts
        FROM events WHERE event_type = 'view'
    )
    SELECT c.uid, c.cid, v.vts AS matched_view_ts
    FROM clicks c ASOF LEFT JOIN views v
      ON c.uid = v.uid AND c.cts >= v.vts
    ORDER BY c.uid, c.cid
    """,
    tags=("chsql", "asof", "sql"),
)
def chsql_asof_sql_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF LEFT JOIN written as ClickHouse SQL text and executed
    through ch_sql's builder dispatch; the oracle is DuckDB's own
    native ASOF JOIN — two independent implementations of the
    reference's semantics (src/Core/Joins.h ASOF >=). The matched VIEW
    TIMESTAMP is the output (tie-safe: equal-best rows share it)."""
    ev = t(spark, sf_dir, "events")
    ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"),
        F.col("ts").cast("timestamp").alias("cts"),
        F.col("event_id").alias("cid"),
    ).createOrReplaceTempView("asofq_clicks")
    ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("uid"),
        F.col("ts").cast("timestamp").alias("vts"),
    ).createOrReplaceTempView("asofq_views")
    return ch_sql(
        spark,
        """
        SELECT c.uid, c.cid, p.vts AS matched_view_ts
        FROM asofq_clicks AS c ASOF LEFT JOIN asofq_views AS p
        ON c.uid = p.uid AND c.cts >= p.vts
        ORDER BY c.uid, c.cid
        """,
    )


@register(
    "chsql_distinct_on_latest_order",
    # DuckDB's native DISTINCT ON is an independent implementation of
    # the same first-row-per-key contract; ties broken by o_orderkey
    # DESC so the pick is total
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od
    FROM orders
    WHERE o_custkey % 100 = 7
    ORDER BY o_custkey, od DESC, o_orderkey DESC
    """,
    tags=("chsql", "distinct_on"),
)
def chsql_distinct_on_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT ON (...) on the SQL TEXT surface (reference
    ParserSelectQuery.cpp lowers it to limit_by_length=1): latest order
    per sampled customer. chsql rewrites it to the row_number window
    wrap (chsql._rewrite_distinct_on, round-6 fuzz finding — the
    operator previously existed only as a DataFrame builder)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return ch_sql(
        spark,
        """
        SELECT DISTINCT ON (o_custkey)
               o_custkey, o_orderkey, toDate(o_orderdate) AS od
        FROM orders
        WHERE o_custkey % 100 == 7
        ORDER BY o_custkey, od DESC, o_orderkey DESC
        """,
    )


@register(
    "chsql_lag_lead_in_frame",
    # frames start/end UNBOUNDED on the probed side, so the exact
    # equivalents are plain lag/lead — two independent realizations
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey, 1, -1) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_key,
           lead(o_orderkey, 1, -1) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS next_key
    FROM orders
    WHERE o_custkey % 50 = 3
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("chsql", "window", "in_frame"),
)
def chsql_lag_lead_in_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lagInFrame / leadInFrame on the SQL text surface (reference
    WindowTransform.cpp:2698 — the frame-AWARE lag/lead pair). The shim
    resolves frame membership at transpile time (chsql
    _rewrite_in_frame, round-6 fuzz finding: the names previously did
    not translate); with an unbounded frame on the probed side they
    lower to plain lag/lead."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return ch_sql(
        spark,
        """
        SELECT o_custkey, o_orderkey,
               lagInFrame(o_orderkey, 1, -1) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_key,
               leadInFrame(o_orderkey, 1, -1) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_key
        FROM orders
        WHERE o_custkey % 50 == 3
        ORDER BY o_custkey, o_orderkey
        """,
    )


@register(
    "chsql_bridge_function_tail",
    # independent DuckDB spellings of the same counting identities
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM((strlen(lower(c_name))
                - strlen(replace(lower(c_name), 'e', '')))) AS BIGINT) AS n_e,
           CAST(MAX(len(list_distinct([c_custkey % 5, c_custkey % 3])))
               AS INT) AS max_card,
           CAST(SUM(bit_count(xor(c_custkey % 16, 5))) AS BIGINT) AS hamm
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("chsql", "bridge"),
)
def chsql_bridge_function_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry functions reaching SQL text through the EXPRESSION
    BRIDGE (chsql._bridge_template, round-6 late): countSubstrings,
    bitmapBuild/bitmapCardinality, bitHammingDistance — none has a
    hand-written text mapping; each call site gets the DataFrame
    registry's own Column tree, rendered and substituted."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return ch_sql(
        spark,
        """
        SELECT c_mktsegment,
               CAST(sum(countSubstrings(lower(c_name), 'e')) AS BIGINT) AS n_e,
               CAST(max(bitmapCardinality(
                   bitmapBuild([c_custkey % 5, c_custkey % 3]))) AS INT)
                   AS max_card,
               CAST(sum(bitHammingDistance(c_custkey % 16, 5)) AS BIGINT)
                   AS hamm
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
    )


@register(
    "chsql_system_numbers_generator",
    oracle="""
    SELECT CAST(SUM(range) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN range % 7 = 3 THEN range END) AS BIGINT) AS s7
    FROM range(10000)
    """,
    tags=("chsql", "system", "numbers"),
)
def chsql_system_numbers_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT ... FROM system.numbers LIMIT n` — the reference's
    idiomatic row generator (StorageSystemNumbers.cpp), served as a
    LAZY spark.range view so LIMIT takes n rows without materializing
    the bound; DuckDB's range() table function is the oracle."""
    return ch_sql(
        spark,
        """
        SELECT CAST(sum(number) AS BIGINT) AS s,
               CAST(count() AS BIGINT) AS n,
               CAST(sumIf(number, number % 7 == 3) AS BIGINT) AS s7
        FROM (SELECT number FROM system.numbers LIMIT 10000)
        """,
    )


@register(
    "chsql_view_tf_apply_exists",
    oracle="""
    WITH base AS (
        SELECT v.c_nationkey AS nk,
               CAST(count(*) AS BIGINT) AS cnt,
               avg(o.o_totalprice) AS avg_p
        FROM orders o
        JOIN (SELECT c_custkey, c_nationkey FROM customer
              WHERE c_custkey < 200) v
          ON o.o_custkey = v.c_custkey
        GROUP BY v.c_nationkey
    )
    SELECT CAST(round(abs(nk)) AS BIGINT) AS nk_r,
           CAST(round(abs(cnt)) AS BIGINT) AS cnt_r,
           round(abs(avg_p)) AS avg_r,
           1 AS orders_exists, 0 AS ghost_exists
    FROM base ORDER BY nk_r
    """,
    tags=("chsql", "dialect", "table_function", "transformers"),
)
def chsql_view_tf_apply_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 SQL-route closures: the view(...) table function
    (src/TableFunctions/TableFunctionView.cpp — a subquery wrapper,
    user alias preserved), the bare-select-list APPLY transformer
    (`a, b APPLY(f) APPLY(g)` applies to EVERY list item, reference
    transformer grammar), and EXISTS TABLE
    (src/Interpreters/InterpreterExistsQuery.cpp — one UInt8
    `result`)."""
    agg = ch_sql(spark, """
        SELECT nk, cnt, avg_p APPLY(abs) APPLY(round)
        FROM view(
            SELECT v.c_nationkey AS nk,
                   toInt64(count()) AS cnt,
                   avg(o.o_totalprice) AS avg_p
            FROM orders o
            JOIN view(SELECT c_custkey, c_nationkey FROM customer
                      WHERE c_custkey < 200) v
              ON o.o_custkey = v.c_custkey
            GROUP BY v.c_nationkey
        ) b
        ORDER BY nk
    """, sf_dir=sf_dir)
    agg = agg.select(
        F.col("`round(abs(nk))`").cast("long").alias("nk_r"),
        F.col("`round(abs(cnt))`").cast("long").alias("cnt_r"),
        F.col("`round(abs(avg_p))`").alias("avg_r"),
    )
    e1 = ch_sql(spark, "EXISTS TABLE orders", sf_dir=sf_dir).collect()[0][0]
    e2 = ch_sql(spark, "EXISTS TABLE no_such_table_r9",
                sf_dir=sf_dir).collect()[0][0]
    return agg.select(
        "*",
        F.lit(int(e1)).alias("orders_exists"),
        F.lit(int(e2)).alias("ghost_exists"),
    )


@register(
    "chsql_create_dictionary_dictget",
    # plain joins reproduce the dictionary lookups in DuckDB
    oracle="""
    WITH enriched AS (
      SELECT s.s_suppkey,
             coalesce(n.n_name, 'unknown') AS nation,
             coalesce(r.r_name, '') AS region,
             CASE WHEN n.n_nationkey IS NOT NULL THEN 1 ELSE 0 END AS has_n
      FROM supplier s
      LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
      LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    )
    SELECT region, CAST(count(*) AS BIGINT) AS n_sup,
           CAST(sum(has_n) AS BIGINT) AS n_matched,
           min(nation) AS first_nation
    FROM enriched GROUP BY region ORDER BY region
    """,
    tags=("chsql", "dictionary"),
)
def chsql_create_dictionary_dictget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE DICTIONARY + dictGet on the SQL-text surface (round-9;
    dictionary_sql.py — InterpreterCreateQuery's dictionary branch,
    FunctionsExternalDictionaries.h): hashed + flat layouts over
    catalog tables, attribute DEFAULTs, dictHas, and a two-level
    lookup chain through a derived table. Each dictGet plans as a
    correlated scalar aggregate subquery that Catalyst decorrelates
    into a BROADCAST join — the reference's hash-lookup shape, fact
    side streams once."""
    ch_sql(spark, """
        CREATE DICTIONARY nation_dict_q (
            n_name String DEFAULT 'unknown',
            n_regionkey UInt64
        ) PRIMARY KEY n_nationkey
        SOURCE(CLICKHOUSE(TABLE 'nation')) LAYOUT(HASHED()) LIFETIME(300)
    """, sf_dir=sf_dir).collect()
    ch_sql(spark, """
        CREATE DICTIONARY region_dict_q (r_name String)
        PRIMARY KEY r_regionkey
        SOURCE(CLICKHOUSE(TABLE 'region')) LAYOUT(FLAT()) LIFETIME(300)
    """, sf_dir=sf_dir).collect()
    return ch_sql(spark, """
        SELECT dictGet('region_dict_q', 'r_name', toUInt64(rk)) AS region,
               count() AS n_sup,
               sum(has_n) AS n_matched,
               min(nation) AS first_nation
        FROM (
            SELECT dictGet('nation_dict_q', 'n_regionkey', s_nationkey) AS rk,
                   dictGet('nation_dict_q', 'n_name', s_nationkey) AS nation,
                   dictHas('nation_dict_q', s_nationkey) AS has_n
            FROM supplier
        )
        GROUP BY region ORDER BY region
    """, sf_dir=sf_dir).select(
        "region",
        F.col("n_sup").cast("long").alias("n_sup"),
        F.col("n_matched").cast("long").alias("n_matched"),
        "first_nation",
    )


@register(
    "chsql_dict_hierarchy_org",
    # DuckDB reproduces the closure with recursive CTEs
    oracle="""
    WITH RECURSIVE org(id, parent) AS (
      SELECT CAST(id AS BIGINT), CAST(parent AS BIGINT)
      FROM (VALUES (1, 0), (2, 1), (3, 1), (4, 2), (5, 4),
                   (6, 2), (7, 3), (8, 7), (9, 7), (10, 9)
           ) AS t(id, parent)
    ),
    chains(id, node, depth) AS (
      SELECT id, id, 0 FROM org
      UNION ALL
      SELECT c.id, o.parent, c.depth + 1
      FROM chains c JOIN org o ON o.id = c.node
      WHERE o.parent <> 0
    ),
    anc AS (
      SELECT id,
             string_agg(CAST(node AS VARCHAR), ',' ORDER BY depth) AS chain,
             count(*) - 1 AS n_ancestors
      FROM chains GROUP BY id
    ),
    kid AS (SELECT parent AS id, count(*) AS n_children
            FROM org WHERE parent <> 0 GROUP BY parent),
    descs AS (
      SELECT node AS id, count(*) AS n_desc
      FROM chains WHERE depth > 0 GROUP BY node
    )
    SELECT o.id,
           a.chain AS ancestors_csv,
           CAST(coalesce(k.n_children, 0) AS BIGINT) AS n_children,
           CAST(coalesce(d.n_desc, 0) AS BIGINT) AS n_descendants,
           CASE WHEN a.chain LIKE '%,1' OR o.id = 1 THEN 1 ELSE 0
           END AS under_root
    FROM org o
    JOIN anc a USING (id)
    LEFT JOIN kid k USING (id)
    LEFT JOIN descs d ON d.id = o.id
    ORDER BY o.id
    """,
    tags=("chsql", "dictionary", "hierarchy"),
)
def chsql_dict_hierarchy_org(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL dictionary family on the SQL route (round-9;
    FunctionsExternalDictionaries.h dictGetHierarchy / dictGetChildren
    / dictGetDescendants / dictIsIn): the closure precomputes at
    CREATE over the broadcast-sized dict
    (dictionary_sql._build_hierarchy_view), each lookup is one
    broadcast scalar subquery."""
    from clickhouse_25_5_3_75_stable_spark.queries import arr_csv

    rows = [(1, 0), (2, 1), (3, 1), (4, 2), (5, 4),
            (6, 2), (7, 3), (8, 7), (9, 7), (10, 9)]
    spark.createDataFrame(rows, "id long, parent long") \
        .createOrReplaceTempView("org_hier_src")
    ch_sql(spark, """
        CREATE DICTIONARY org_hier_dict (parent UInt64 HIERARCHICAL)
        PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 'org_hier_src'))
        LAYOUT(HASHED())
    """).collect()
    out = ch_sql(spark, """
        SELECT id,
               dictGetHierarchy('org_hier_dict', id) AS chain,
               dictGetChildren('org_hier_dict', id) AS kids,
               dictGetDescendants('org_hier_dict', id) AS descs,
               dictIsIn('org_hier_dict', id, toUInt64(1)) AS under_root
        FROM org_hier_src ORDER BY id
    """)
    return out.select(
        "id",
        arr_csv(F.col("chain")).alias("ancestors_csv"),
        F.size("kids").cast("long").alias("n_children"),
        F.size("descs").cast("long").alias("n_descendants"),
        F.col("under_root").cast("int").alias("under_root"),
    )
