"""Aggregate-function breadth, part 4 (SURVEY §2.4): the remaining
reference registrations from /root/reference/src/AggregateFunctions/
registerAggregateFunctions.cpp —

  anyHeavy (AggregateFunctionAnyHeavy.cpp), singleValueOrNull
  (AggregateFunctionSingleValueOrNull.cpp), deltaSumTimestamp
  (AggregateFunctionDeltaSumTimestamp.cpp), exponentialMovingAverage
  (AggregateFunctionExpMovingAverage.cpp?? registered :196), sparkbar
  (AggregateFunctionSparkbar.cpp), largestTriangleThreeBuckets
  (AggregateFunctionLargestTriangleThreeBuckets.cpp),
  categoricalInformationValue (AggregateFunctionCategoricalIV.cpp),
  meanZTest / analysisOfVariance (AggregateFunctionMeanZTest.cpp,
  AggregateFunctionAnalysisOfVariance.cpp), mannWhitneyUTest
  (AggregateFunctionMannWhitney.cpp), groupArrayInsertAt
  (AggregateFunctionGroupArrayInsertAt.cpp), and the -ForEach
  combinator (AggregateFunctionForEach.cpp) as element-wise array
  aggregation.

Each is re-expressed as relational Spark (groupBy / window / join) so
the state stays map-side combinable; nothing collects to the driver.
Exactness follows the repo convention: integer counts + decimal
accumulation, transcendental outputs rounded to 6 decimals (ULP noise
between libm and the JVM sits far below that).
Imported by queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.numeric import dsum
from clickhouse_25_5_3_75_stable_spark.queries import arr_csv, arr_csv_dec, register, t

_DEC6 = "decimal(25,6)"


def _r6(c) -> F.Column:
    """Round a double through decimal(25,6) — order/libm-noise proof."""
    return c.cast(_DEC6).cast("double")


def _r6_sql(expr: str) -> str:
    return f"CAST(CAST(({expr}) AS DECIMAL(25,6)) AS DOUBLE)"


def _dec6_sum_sql(expr: str) -> str:
    """Order-free sum of per-row doubles (see queries_agg_extras2)."""
    return (
        f"CAST(CAST(SUM(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(25,6)))"
        f" AS STRING) AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# anyHeavy + singleValueOrNull
# ---------------------------------------------------------------------------


@register(
    "agg_any_heavy_single_value",
    oracle="""
    WITH counted AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c
        FROM orders GROUP BY 1, 2
    ), ranked AS (
        SELECT o_orderpriority, o_orderstatus, c,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY c DESC, o_orderstatus) AS rn,
               SUM(c) OVER (PARTITION BY o_orderpriority) AS n,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_distinct
        FROM counted
    )
    SELECT o_orderpriority,
           o_orderstatus AS heavy_status,
           CASE WHEN c * 2 > n THEN o_orderstatus END AS majority_status,
           CASE WHEN n_distinct = 1 THEN o_orderstatus END AS single_status
    FROM ranked WHERE rn = 1
    ORDER BY o_orderpriority
    """,
    tags=("agg", "any_heavy"),
)
def agg_any_heavy_single_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """anyHeavy(o_orderstatus) per priority — heavy-hitter candidate
    (reference AggregateFunctionAnyHeavy.cpp implements Boyer-Moore
    majority; we return the deterministic mode, which equals the
    majority element whenever one exists — majority_status marks when
    the >n/2 guarantee actually holds) — plus singleValueOrNull
    (AggregateFunctionSingleValueOrNull.cpp: the value iff the group
    has exactly one distinct value, else NULL). One count-per-pair agg
    plus a per-group window over the tiny distinct space — map-side
    combinable at any scale."""
    od = t(spark, sf_dir, "orders")
    counted = od.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("o_orderpriority")
    ranked = counted.withColumns(
        {
            "rn": F.row_number().over(
                w.orderBy(F.col("c").desc(), F.col("o_orderstatus"))
            ),
            "n": F.sum("c").over(w),
            "n_distinct": F.count(F.lit(1)).over(w),
        }
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("heavy_status"),
            F.when(F.col("c") * 2 > F.col("n"), F.col("o_orderstatus")).alias(
                "majority_status"
            ),
            F.when(F.col("n_distinct") == 1, F.col("o_orderstatus")).alias(
                "single_status"
            ),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# deltaSumTimestamp
# ---------------------------------------------------------------------------


@register(
    "agg_delta_sum_timestamp",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT user_id,
           {_dec6_sum_sql('CASE WHEN value > prev THEN value - prev ELSE 0 END')}
             AS delta_sum_ts,
           COUNT(*) AS n
    FROM ordered
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "delta_sum"),
)
def agg_delta_sum_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deltaSumTimestamp(value, ts) per user (reference
    AggregateFunctionDeltaSumTimestamp.cpp: sum of positive deltas in
    timestamp order; event_id breaks ts ties deterministically). A
    per-key window then one groupBy — both partition by user_id so AQE
    reuses the exchange."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    delta = F.when(F.col("value") > prev, F.col("value") - prev).otherwise(F.lit(0.0))
    return (
        ev.select("user_id", delta.alias("d"))
        .groupBy("user_id")
        .agg(dsum(F.col("d")).alias("delta_sum_ts"), F.count(F.lit(1)).alias("n"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# exponentialMovingAverage
# ---------------------------------------------------------------------------


@register(
    "agg_exp_moving_average",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
               MAX(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY event_type) AS tmax
        FROM events
    ), wx AS (
        SELECT event_type,
               value * exp(-CAST(tmax - tu AS DOUBLE) * 1.92541e-10) AS wv,
               exp(-CAST(tmax - tu AS DOUBLE) * 1.92541e-10) AS w
        FROM ev
    ), wtd AS (
        SELECT event_type,
               {_dec6_sum_sql('CASE WHEN abs(wv) < 1e-7 THEN 0.0 ELSE wv END')} AS wsum,
               {_dec6_sum_sql('CASE WHEN abs(w) < 1e-7 THEN 0.0 ELSE w END')} AS wtot
        FROM wx GROUP BY event_type
    )
    SELECT event_type, {_r6_sql('wsum / wtot')} AS ema
    FROM wtd ORDER BY event_type
    """,
    tags=("agg", "ema"),
)
def agg_exp_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exponentialMovingAverage(halflife=1h)(value, ts) per event_type
    (reference AggregateFunctionExponentialMovingAverage.cpp,
    registerAggregateFunctions.cpp:196). Weight 2^(-(tmax-t)/hl) =
    exp(-(tmax-t)us * ln2/3.6e9); anchoring at the group max-ts makes
    the aggregate order-free, so it is a plain two-pass groupBy —
    map-side combinable, no sequential state. Final division rounded
    to 6 dp (libm-vs-JVM exp ULPs sit far below). Per-row terms under
    1e-7 are clamped to exact 0.0 on BOTH sides: DuckDB's VARCHAR->
    DECIMAL cast mis-rounds deep-underflow doubles (9e-26 -> 0.000001)
    while the JVM truncates them to zero."""
    ev = t(spark, sf_dir, "events")
    tu = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select("event_type", "value", tu.alias("tu"))
    # ln2 / 3.6e9 us, literal-matched with the oracle text
    lam = 1.92541e-10
    wmax = Window.partitionBy("event_type")
    clamp = lambda c: F.when(F.abs(c) < 1e-7, F.lit(0.0)).otherwise(c)  # noqa: E731
    wtd = base.withColumn("tmax", F.max("tu").over(wmax)).select(
        "event_type",
        clamp(
            F.col("value") * F.exp(-(F.col("tmax") - F.col("tu")).cast("double") * lam)
        ).alias("wv"),
        clamp(F.exp(-(F.col("tmax") - F.col("tu")).cast("double") * lam)).alias("w"),
    )
    return (
        wtd.groupBy("event_type")
        .agg(dsum(F.col("wv")).alias("wsum"), dsum(F.col("w")).alias("wtot"))
        .select("event_type", _r6(F.col("wsum") / F.col("wtot")).alias("ema"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# sparkbar
# ---------------------------------------------------------------------------

_BARS = "▁▂▃▄▅▆▇█"


@register(
    "agg_sparkbar_hourly",
    oracle=f"""
    WITH hours AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), scaled AS (
        SELECT event_type, h, c,
               MIN(c) OVER (PARTITION BY event_type) AS cmin,
               MAX(c) OVER (PARTITION BY event_type) AS cmax
        FROM hours
    )
    SELECT event_type,
           string_agg(
               substring('{_BARS}',
                         CAST(CASE WHEN cmax = cmin THEN 7
                              ELSE ((c - cmin) * 7) // (cmax - cmin) END
                              AS INTEGER) + 1, 1),
               '' ORDER BY h) AS spark_bar,
           COUNT(*) AS n_buckets
    FROM scaled
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "sparkbar"),
)
def agg_sparkbar_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparkbar(24)(hour, count) per event_type (reference
    AggregateFunctionSparkbar.cpp renders a ▁▂▃▄▅▆▇█ bar string;
    bucket heights min-max-scaled to the 8 glyph levels with integer
    floor division — deterministic in both engines). Built as
    count-per-hour agg → per-group min/max window → ordered array_join;
    no collect, no per-row Python."""
    ev = t(spark, sf_dir, "events")
    hours = ev.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type")
    scaled = hours.withColumns(
        {"cmin": F.min("c").over(w), "cmax": F.max("c").over(w)}
    )
    level = (
        F.when(F.col("cmax") == F.col("cmin"), F.lit(7))
        .otherwise(F.expr("((c - cmin) * 7) div (cmax - cmin)"))
        .cast("int")
    )
    glyph = F.substring(F.lit(_BARS), level + F.lit(1), F.lit(1))
    return (
        scaled.select("event_type", "h", glyph.alias("g"))
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "g"))),
                    lambda s: s["g"],
                ),
                "",
            ).alias("spark_bar"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# largestTriangleThreeBuckets (bucket-mean variant)
# ---------------------------------------------------------------------------


@register(
    "agg_lttb_downsample",
    oracle="""
    WITH pts AS (
        SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS x, o_totalprice AS y,
               o_orderkey
        FROM orders
    ), bounds AS (
        SELECT MIN(x) AS xmin, MAX(x) AS xmax FROM pts
    ), bucketed AS (
        SELECT pts.*, CAST(((x - xmin) * 20) // (xmax - xmin + 1) AS BIGINT) AS b
        FROM pts, bounds
    ), means AS (
        SELECT b, CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS STRING) AS DOUBLE)
                    / COUNT(*) AS mx,
               CAST(CAST(SUM(CAST(CAST(y AS VARCHAR) AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
                 / COUNT(*) AS my
        FROM bucketed GROUP BY b
    ), ctx AS (
        SELECT b, lag(mx) OVER (ORDER BY b) AS px, lag(my) OVER (ORDER BY b) AS py,
               lead(mx) OVER (ORDER BY b) AS nx, lead(my) OVER (ORDER BY b) AS ny
        FROM means
    ), scored AS (
        SELECT bucketed.b, x, y, o_orderkey,
               abs((px - nx) * (y - py) - (px - x) * (ny - py)) AS area
        FROM bucketed JOIN ctx ON bucketed.b = ctx.b
        WHERE px IS NOT NULL AND nx IS NOT NULL
    ), picked AS (
        SELECT b, x, y,
               row_number() OVER (PARTITION BY b
                                  ORDER BY area DESC, x, o_orderkey) AS rn
        FROM scored
    )
    SELECT b, x, y FROM picked WHERE rn = 1 ORDER BY b
    """,
    tags=("agg", "lttb"),
)
def agg_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """largestTriangleThreeBuckets(20)(o_orderdate, o_totalprice)
    (reference AggregateFunctionLargestTriangleThreeBuckets.cpp). The
    reference picks each bucket's point by triangle area against the
    PREVIOUSLY SELECTED point (sequential); this variant anchors on the
    neighbor-bucket means instead — the standard parallel-friendly
    LTTB relaxation — so every bucket's argmax is independent: one agg
    for bucket means, one broadcast-joined window for prev/next, one
    per-bucket top-1. Area compares products of exact per-row doubles,
    ties broken by x then orderkey."""
    od = t(spark, sf_dir, "orders")
    pts = od.select(
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("x"),
        F.col("o_totalprice").alias("y"),
        "o_orderkey",
    )
    bounds = pts.agg(F.min("x").alias("xmin"), F.max("x").alias("xmax"))
    bucketed = pts.crossJoin(F.broadcast(bounds)).withColumn(
        "b", F.expr("((x - xmin) * 20) div (xmax - xmin + 1)")
    )
    means = bucketed.groupBy("b").agg(
        (
            F.sum(F.col("x").cast("decimal(38,0)")).cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("mx"),
        (dsum(F.col("y")) / F.count(F.lit(1))).alias("my"),
    )
    wb = Window.orderBy("b")
    ctx = means.select(
        "b",
        F.lag("mx").over(wb).alias("px"),
        F.lag("my").over(wb).alias("py"),
        F.lead("mx").over(wb).alias("nx"),
        F.lead("my").over(wb).alias("ny"),
    )
    scored = (
        bucketed.join(F.broadcast(ctx), "b")
        .filter(F.col("px").isNotNull() & F.col("nx").isNotNull())
        .withColumn(
            "area",
            F.abs(
                (F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
                - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
            ),
        )
    )
    picked = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("b").orderBy(
                F.col("area").desc(), F.col("x"), F.col("o_orderkey")
            )
        ),
    )
    return picked.filter(F.col("rn") == 1).select("b", "x", "y").orderBy("b")


# ---------------------------------------------------------------------------
# categoricalInformationValue
# ---------------------------------------------------------------------------


@register(
    "agg_categorical_iv",
    oracle=f"""
    WITH cats AS (
        SELECT o_orderpriority AS cat,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS g,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS b
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(g) AS DOUBLE) AS gt, CAST(SUM(b) AS DOUBLE) AS bt FROM cats
    )
    SELECT cat,
           {_r6_sql('(g / gt - b / bt) * ln((g * bt) / (b * gt))')} AS iv_term,
           CAST(g AS BIGINT) AS n_good, CAST(b AS BIGINT) AS n_bad
    FROM cats, tot
    ORDER BY cat
    """,
    tags=("agg", "categorical_iv"),
)
def agg_categorical_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """categoricalInformationValue(status='F'; category=priority)
    (reference AggregateFunctionCategoricalIV.cpp): per-category WoE*
    share term (g/G - b/B)·ln(gB/(bG)). Integer counts only until the
    final per-category double expression — one groupBy plus a broadcast
    of the 1-row totals."""
    od = t(spark, sf_dir, "orders")
    is_good = (F.col("o_orderstatus") == "F").cast("long")
    cats = od.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.sum(is_good).alias("g"), F.sum(1 - is_good).alias("b")
    )
    tot = cats.agg(
        F.sum("g").cast("double").alias("gt"), F.sum("b").cast("double").alias("bt")
    )
    g, b, gt, bt = F.col("g"), F.col("b"), F.col("gt"), F.col("bt")
    return (
        cats.crossJoin(F.broadcast(tot))
        .select(
            "cat",
            _r6((g / gt - b / bt) * F.log((g * bt) / (b * gt))).alias("iv_term"),
            g.alias("n_good"),
            b.alias("n_bad"),
        )
        .orderBy("cat")
    )


# ---------------------------------------------------------------------------
# meanZTest + analysisOfVariance
# ---------------------------------------------------------------------------


_MEAN_CLICK = "(SELECT s / n FROM m WHERE event_type = 'click')"
_MEAN_VIEW = "(SELECT s / n FROM m WHERE event_type = 'view')"
_VARN_CLICK = "(SELECT (ss - s * s / n) / (n * n) FROM m WHERE event_type = 'click')"
_VARN_VIEW = "(SELECT (ss - s * s / n) / (n * n) FROM m WHERE event_type = 'view')"
_SB = "(SELECT " + _dec6_sum_sql("s * s / n") + " FROM m)"

_MEAN_Z_ANOVA_ORACLE = (
    """
    WITH m AS (
        SELECT event_type, COUNT(*) AS n,
               """
    + _dec6_sum_sql("value")
    + """ AS s,
               """
    + _dec6_sum_sql("value * value")
    + """ AS ss
        FROM events GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(n) AS DOUBLE) AS nt,
               COUNT(*) AS k
        FROM m
    ), sums AS (
        SELECT """
    + _dec6_sum_sql("s")
    + " AS st, "
    + _dec6_sum_sql("ss")
    + """ AS sst FROM m
    ), z AS (
        SELECT
          """
    + _r6_sql(_MEAN_CLICK + " - " + _MEAN_VIEW)
    + """ AS mean_diff,
          """
    + _r6_sql(
        "("
        + _MEAN_CLICK
        + " - "
        + _MEAN_VIEW
        + ") / sqrt("
        + _VARN_CLICK
        + " + "
        + _VARN_VIEW
        + ")"
    )
    + """ AS z_stat
    ), a AS (
        SELECT """
    + _r6_sql(
        "(("
        + _SB
        + " - st * st / nt) / (k - 1)) / ((sst - "
        + _SB
        + ") / (nt - k))"
    )
    + """ AS f_stat,
        k - 1 AS df_between, CAST(nt AS BIGINT) - k AS df_within
        FROM tot, sums
    )
    SELECT z.mean_diff, z.z_stat, a.f_stat, a.df_between, a.df_within
    FROM z, a
    """
)


@register(
    "agg_mean_z_anova",
    oracle=_MEAN_Z_ANOVA_ORACLE,
    tags=("agg", "stat_tests"),
)
def agg_mean_z_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """meanZTest(click vs view) + anova across all event_types
    (reference AggregateFunctionMeanZTest.cpp — population-variance z;
    AggregateFunctionAnalysisOfVariance.cpp — one-way F). Everything
    reduces to per-group moments (n, Σx, Σx²) in one decimal-exact
    groupBy; the scalar assembly is driver-free crossjoin of 1-row
    frames. Rounded to 6 dp."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(v).alias("s"),
        dsum(v * v).alias("ss"),
    )
    # z-test between click and view: pop-variance / n each side
    pick = lambda et, col: F.first(F.when(F.col("event_type") == et, F.col(col)), ignorenulls=True)  # noqa: E731
    zrow = m.agg(
        pick("click", "s").alias("cs"),
        pick("click", "n").alias("cn"),
        pick("click", "ss").alias("css"),
        pick("view", "s").alias("vs"),
        pick("view", "n").alias("vn"),
        pick("view", "ss").alias("vss"),
    )
    cs, cn, css = F.col("cs"), F.col("cn"), F.col("css")
    vs, vn, vss = F.col("vs"), F.col("vn"), F.col("vss")
    mean_diff = cs / cn - vs / vn
    var_term = (css - cs * cs / cn) / (cn * cn) + (vss - vs * vs / vn) / (vn * vn)
    z = zrow.select(
        _r6(mean_diff).alias("mean_diff"),
        _r6(mean_diff / F.sqrt(var_term)).alias("z_stat"),
    )
    tot = m.agg(
        F.sum("n").cast("double").alias("nt"),
        dsum(F.col("s")).alias("st"),
        dsum(F.col("ss")).alias("sst"),
        F.count(F.lit(1)).alias("k"),
        dsum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    nt, st, sst, k, sb = (F.col(c) for c in ("nt", "st", "sst", "k", "sb"))
    f_stat = ((sb - st * st / nt) / (k - 1)) / ((sst - sb) / (nt - k))
    a = tot.select(
        _r6(f_stat).alias("f_stat"),
        (k - 1).alias("df_between"),
        (nt.cast("bigint") - k).alias("df_within"),
    )
    return z.crossJoin(a)


# ---------------------------------------------------------------------------
# mannWhitneyUTest
# ---------------------------------------------------------------------------


@register(
    "agg_mann_whitney_u",
    oracle=f"""
    WITH ab AS (
        SELECT value, event_type FROM events
        WHERE event_type IN ('click', 'view')
    ), by_val AS (
        SELECT value,
               COUNT(*) AS cnt,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cnt_a
        FROM ab GROUP BY value
    ), ranked AS (
        SELECT value, cnt, cnt_a,
               COALESCE(SUM(cnt) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        FROM by_val
    )
    SELECT
      {_dec6_sum_sql('cnt_a * (below + (cnt + 1) / 2.0)')} AS rank_sum_a,
      {_dec6_sum_sql('cnt_a * (below + (cnt + 1) / 2.0)')}
        - (SELECT COUNT(*) FROM ab WHERE event_type = 'click')
        * ((SELECT COUNT(*) FROM ab WHERE event_type = 'click') + 1) / 2.0 AS u_stat,
      (SELECT COUNT(*) FROM ab WHERE event_type = 'click') AS n_a,
      (SELECT COUNT(*) FROM ab WHERE event_type = 'view') AS n_b
    FROM ranked
    """,
    tags=("agg", "mann_whitney"),
)
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mannWhitneyUTest(click vs view) U statistic (reference
    AggregateFunctionMannWhitney.cpp). Midranks come from value-level
    counts — groupBy(value) then a cumulative window over the distinct
    values — so no per-row global sort; tied values get the textbook
    average rank. U = R_A - n_A(n_A+1)/2, decimal-exact."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "view"))
    by_val = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("cnt_a"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_val.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    midrank_sum = dsum(
        F.col("cnt_a") * (F.col("below") + (F.col("cnt") + 1) / 2.0)
    )
    sums = ranked.agg(
        midrank_sum.alias("rank_sum_a"),
        F.sum("cnt_a").alias("n_a"),
        (F.sum("cnt") - F.sum("cnt_a")).alias("n_b"),
    )
    return sums.select(
        "rank_sum_a",
        (
            F.col("rank_sum_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
        ).alias("u_stat"),
        "n_a",
        "n_b",
    )


# ---------------------------------------------------------------------------
# groupArrayInsertAt
# ---------------------------------------------------------------------------


@register(
    "agg_group_array_insert_at",
    oracle="""
    WITH per_hour AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), grid AS (
        SELECT DISTINCT event_type, gs.g AS h
        FROM per_hour, generate_series(0, 23) AS gs(g)
    )
    SELECT grid.event_type,
           COALESCE(array_to_string(list(COALESCE(per_hour.c, 0) ORDER BY grid.h), ','), '') AS hourly_counts
    FROM grid LEFT JOIN per_hour
      ON grid.event_type = per_hour.event_type AND grid.h = per_hour.h
    GROUP BY grid.event_type
    ORDER BY grid.event_type
    """,
    tags=("agg", "group_array_insert_at"),
)
def agg_group_array_insert_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArrayInsertAt(0, 24)(count, hour) per event_type (reference
    AggregateFunctionGroupArrayInsertAt.cpp: place each value at its
    position, default-fill holes). Spark shape: count-per-hour agg →
    map_from_entries → one transform over sequence(0,23) — the dense
    array never rides the shuffle, only the sparse (hour,count) pairs."""
    ev = t(spark, sf_dir, "events")
    per_hour = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_hour.groupBy("event_type")
        .agg(F.map_from_entries(F.collect_list(F.struct("h", "c"))).alias("m"))
        .select(
            "event_type",
            arr_csv(
                F.transform(
                    F.sequence(F.lit(0), F.lit(23)),
                    lambda i: F.coalesce(F.col("m")[i.cast("bigint")], F.lit(0)),
                )
            ).alias("hourly_counts"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# -ForEach combinator: element-wise aggregation over array columns
# ---------------------------------------------------------------------------


@register(
    "agg_foreach_centroid",
    oracle="""
    WITH zipped AS (
        SELECT label,
               UNNEST(range(len(embedding))) AS pos,
               UNNEST(embedding) AS v0
        FROM embeddings
    ), exploded AS (
        SELECT label, pos, CAST(CAST(v0 AS DOUBLE) AS DECIMAL(25,6)) AS v
        FROM zipped
    ), per_pos AS (
        SELECT label, pos,
               CAST(CAST(SUM(v) AS STRING) AS DOUBLE) / COUNT(*) AS m
        FROM exploded GROUP BY label, pos
    )
    SELECT label,
           COALESCE(array_to_string(list_transform(list(m ORDER BY pos),
               x -> CAST(CAST(CAST(x AS VARCHAR) AS DECIMAL(25,6)) AS VARCHAR)), ','), '') AS centroid,
           COUNT(*) AS dim
    FROM per_pos
    GROUP BY label
    ORDER BY label
    """,
    tags=("agg", "foreach"),
)
def agg_foreach_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avgForEach(embedding) per label — the -ForEach combinator
    (reference AggregateFunctionForEach.cpp applies an aggregate
    element-wise across array columns; avgForEach of embeddings = the
    per-label centroid, the building block of IVF coarse quantization).
    posexplode → (label,pos) decimal-exact avg → re-assemble sorted.
    The shuffle carries scalar (label,pos,sum) cells, not arrays."""
    emb = t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select("label", "pos", F.col("v").cast("double").cast(_DEC6).alias("v"))
    per_pos = exploded.groupBy("label", "pos").agg(
        (F.sum("v").cast("string").cast("double") / F.count(F.lit(1))).alias("m")
    )
    return (
        per_pos.groupBy("label")
        .agg(
            arr_csv_dec(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                )
            ).alias("centroid"),
            F.count(F.lit(1)).alias("dim"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# -Resample combinator
# ---------------------------------------------------------------------------


@register(
    "agg_resample_combinator",
    oracle="""
    WITH bucketed AS (
        SELECT event_type, (user_id % 100) // 25 AS rb,
               COUNT(*) AS c,
               CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(25,6)))
                    AS STRING) AS DOUBLE) AS s
        FROM events
        WHERE (user_id % 100) < 100
        GROUP BY 1, 2
    ), grid AS (
        SELECT DISTINCT event_type, gs.g AS rb
        FROM bucketed, generate_series(0, 3) AS gs(g)
    )
    SELECT grid.event_type,
           COALESCE(array_to_string(list(COALESCE(bucketed.c, 0) ORDER BY grid.rb), ','), '') AS count_resample,
           COALESCE(array_to_string(list_transform(list(COALESCE(bucketed.s, 0.0) ORDER BY grid.rb),
               x -> CAST(CAST(CAST(x AS VARCHAR) AS DECIMAL(25,6)) AS VARCHAR)), ','), '') AS sum_resample
    FROM grid LEFT JOIN bucketed
      ON grid.event_type = bucketed.event_type AND grid.rb = bucketed.rb
    GROUP BY grid.event_type
    ORDER BY grid.event_type
    """,
    tags=("agg", "resample"),
)
def agg_resample_combinator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countResample(0,100,25) / sumResample(0,100,25)(value, user_id%100)
    — the -Resample combinator (reference
    AggregateFunctionResample.cpp splits one aggregate into fixed key
    ranges and returns an array). Spark shape: bucket-key groupBy then
    dense re-assembly via map_from_entries — the array exists only
    after the final agg, scalar cells ride the shuffle."""
    ev = t(spark, sf_dir, "events")
    rb = F.expr("(user_id % 100) div 25").alias("rb")
    bucketed = ev.groupBy("event_type", rb).agg(
        F.count(F.lit(1)).alias("c"), dsum(F.col("value")).alias("s")
    )
    grid = F.sequence(F.lit(0), F.lit(3))
    return (
        bucketed.groupBy("event_type")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("rb", "c"))).alias("mc"),
            F.map_from_entries(F.collect_list(F.struct("rb", "s"))).alias("ms"),
        )
        .select(
            "event_type",
            arr_csv(
                F.transform(grid, lambda i: F.coalesce(F.col("mc")[i.cast("bigint")], F.lit(0)))
            ).alias("count_resample"),
            arr_csv_dec(
                F.transform(grid, lambda i: F.coalesce(F.col("ms")[i.cast("bigint")], F.lit(0.0)))
            ).alias("sum_resample"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# generate_series table function
# ---------------------------------------------------------------------------


@register(
    "table_function_generate_series",
    oracle="""
    SELECT generate_series, generate_series * 3 AS tripled
    FROM generate_series(10, 200, 7)
    ORDER BY generate_series
    """,
    tags=("table_function", "generate_series"),
)
def table_function_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_series(10, 200, 7) (reference
    src/TableFunctions/registerTableFunctions.cpp:13-14 — inclusive
    stop) — spark.range under the hood, cluster-parallel."""
    from clickhouse_25_5_3_75_stable_spark.sources.table_functions import (
        generate_series,
    )

    s = generate_series(spark, 10, 200, 7)
    return s.select(
        "generate_series", (F.col("generate_series") * 3).alias("tripled")
    ).orderBy("generate_series")
