"""Physical-plan shape assertions — the 100 TB sanity checks
(SURVEY §4): filters reach the parquet scan, projections prune columns,
small dims broadcast, aggregations are two-phase (map-side partials).
"""

from __future__ import annotations

import contextlib
import io

from clickhouse_25_5_3_75_stable_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q6_filters_pushed_to_parquet_scan(spark):
    plan = _plan(spark, "q6_revenue_forecast")
    assert "PushedFilters: [" in plan
    # the range predicates must reach the reader, not sit in a Filter only
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q6_reads_only_needed_columns(spark):
    plan = _plan(spark, "q6_revenue_forecast")
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    for col in ("l_orderkey", "l_comment", "l_returnflag", "l_partkey"):
        assert col not in read


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(spark, "q5_regional_revenue", mode="simple")
    assert "BroadcastHashJoin" in plan


def test_q1_aggregation_is_two_phase(spark):
    """Map-side partial aggregation: the shuffle carries |groups| rows
    per task, not the scan — the scale-critical property."""
    plan = _plan(spark, "q1_pricing_summary", mode="formatted")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan.lower() or "Partial" in plan


def test_q3_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject, never a
    global sort of the full aggregate output."""
    plan = _plan(spark, "q3_shipping_priority", mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_similarity_topk_no_global_sort(spark):
    plan = _plan(spark, "similarity_topk_bruteforce", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_dict_get_is_broadcast_join(spark):
    plan = _plan(spark, "dict_get_nation_region", mode="simple")
    assert "BroadcastHashJoin" in plan


def _exec_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_sample_filter_applied_at_scan(spark):
    """SAMPLE is a pure row-local predicate — it must sit directly on
    the file scan (DataFilters), never behind a shuffle."""
    plan = _exec_plan(spark, "sample_deterministic_tenth")
    assert "pmod(l_orderkey" in plan  # the ring predicate exists
    # the Filter node is immediately above the scan: between them only
    # whitespace/indent (no Exchange)
    filter_to_scan = plan.split("Filter")[-1].split("FileScan")[0]
    assert "Exchange" not in filter_to_scan


def test_range_dictionary_is_broadcast(spark):
    plan = _plan(spark, "dict_range_price_tiers")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_projection_router_never_rescans_fact(spark):
    """The projection query re-aggregates partial states; the fact
    table must be scanned exactly once."""
    plan = _exec_plan(spark, "projection_reaggregate_returnflag")
    assert plan.count("FileScan parquet") == 1


def test_mutation_stays_scan_filter_project(spark):
    """UPDATE+DELETE lower to scan→filter→project→agg — one scan, no
    join: the copy-on-write SELECT the reference's MutationsInterpreter
    generates, expressed declaratively."""
    plan = _exec_plan(spark, "mutation_update_delete_orders")
    assert "Join" not in plan
    assert plan.count("FileScan parquet") == 1


def test_ivf_probe_is_broadcast_no_shuffle_of_vectors(spark):
    """IVF: the probe set broadcasts; the vector table must not
    shuffle before scoring."""
    plan = _plan(spark, "similarity_ivf_ann")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_paste_join_has_no_global_single_partition_sort(spark):
    """paste_join must rank via range-partitioned per-partition windows
    — an un-partitioned row_number window would plan an Exchange
    SinglePartition (one task sorts everything)."""
    from clickhouse_25_5_3_75_stable_spark.operators.joins import paste_join

    a = spark.range(0, 1000).withColumnRenamed("id", "a")
    b = spark.range(0, 1000).withColumnRenamed("id", "b")
    out = paste_join(a, b, ["a"], ["b"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # and it still zips correctly
    rows = out.orderBy("a").limit(3).collect()
    assert [(r.a, r.b) for r in rows] == [(0, 0), (1, 1), (2, 2)]


def test_cobucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed identically on the join key must
    sort-merge-join with NO Exchange on either side — the layout that
    deletes both fact-side shuffles at 100 TB."""
    from clickhouse_25_5_3_75_stable_spark.sources.bucketing import (
        cobucketed_join,
        write_bucketed,
    )

    a = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS vb")
    try:
        write_bucketed(a, "bkt_a", 8, ["k"], ["k"])
        write_bucketed(b, "bkt_b", 8, ["k"], ["k"])
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cobucketed_join(spark, "bkt_a", "bkt_b", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path):
    """Aggregation-in-order analogue (reference AggregatingInOrder-
    Transform/optimizeReadInOrder): grouping by a bucketed table's
    bucket key plans with NO Exchange — the scan already satisfies the
    required distribution."""
    from clickhouse_25_5_3_75_stable_spark.sources.bucketing import write_bucketed

    df = spark.range(0, 20000).selectExpr("id % 100 AS k", "id AS v")
    try:
        write_bucketed(df, "bkt_agg", 8, ["k"])
        agg = spark.table("bkt_agg").groupBy("k").sum("v")
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_agg")


def test_dynamic_partition_pruning_on_layout(spark, tmp_path):
    """The reference's CreateSetAndFilterOnTheFlyStep / partition-key
    pruning analogue: joining a MergeTree-layout (partitioned) fact
    with a filtered dim must plan dynamic partition pruning — the scan
    reads only the dim's surviving partitions."""
    facts = spark.range(0, 100000).selectExpr("id", "id % 50 AS part_key", "id * 2 AS v")
    d = str(tmp_path / "facts")
    facts.write.partitionBy("part_key").mode("overwrite").parquet(d)
    dim = (
        spark.range(0, 50)
        .selectExpr("id AS part_key", "concat('n', id) AS name")
        .filter("part_key < 3")
    )
    j = spark.read.parquet(d).join(dim, "part_key")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert j.count() == 6000


def test_contamination_broadcasts_eval_set(spark):
    """The eval corpus's shingle hashes must broadcast — a shuffled
    join here would move the full TRAIN shingle stream for a test set
    that is orders of magnitude smaller."""
    plan = _plan(spark, "decontaminate_ngram_overlap", mode="simple")
    assert "BroadcastHashJoin" in plan


def test_pack_shards_has_no_global_window(spark):
    """The prefix sum must decompose per-bucket: a Window with an
    empty partition spec ('Window [...] ORDER BY' with no PARTITION BY
    → a single task holding every row) is the scale-killer the
    two-phase form exists to avoid."""
    import re as _re

    plan = _plan(spark, "pack_token_budget_shards", mode="formatted")
    for m in _re.finditer(r"Window \[", plan):
        seg = plan[m.start():plan.index("\n", m.start())]
        assert "windowspecdefinition(__bucket" in seg or "__bucket" in seg, seg


def test_bm25_filters_query_terms_before_shuffle(spark):
    """The IN-filter on the literal query terms must sit below the
    aggregation exchange, so the shuffle carries <=|q| rows per doc.
    (materialize=False: the round-10 production path checkpoints the
    tf relation, which truncates the visible lineage — the un-
    materialized plan is the same logical shape with lineage intact.)"""
    from clickhouse_25_5_3_75_stable_spark.operators.corpus import bm25_scores
    from clickhouse_25_5_3_75_stable_spark.queries import t as _t

    docs = _t(spark, SF_SMOKE, "documents")
    df = bm25_scores(docs, ["spark", "hash", "merge"], materialize=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    lines = plan.splitlines()
    filt = [i for i, l in enumerate(lines) if "Filter" in l and "spark" in l]
    assert filt, "expected a Filter on the literal query terms"
    # simple mode prints root->leaf: no Exchange may appear BELOW the
    # term filter on its branch (i.e., between the filter and the scan)
    below = lines[filt[-1] + 1:]
    branch = []
    for l in below:
        branch.append(l)
        if "Scan parquet" in l or "FileScan" in l:
            break
    assert not any("Exchange" in l for l in branch), branch


def test_gin_sidecar_lookup_pushes_hash_filter(spark, tmp_path):
    """The gin posting-list lookup must push the token-hash predicate
    into the sidecar's parquet scan (the sidecar is written sorted by
    token_hash precisely so min/max stats prune its files) — a
    post-scan filter would read the whole inverted index."""
    from pyspark.sql import functions as F

    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        build_gin_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma_{i % 7} delta") for i in range(200)],
        "doc_id long, text string",
    )
    table = str(tmp_path / "t")
    docs.repartition(4).write.mode("overwrite").parquet(table)
    idx = str(tmp_path / "i")
    build_gin_index(spark, table, "text", idx, "doc_id")

    probe = spark.range(1).select(F.xxhash64(F.lit("beta")).alias("h")).collect()[0].h
    lookup = spark.read.parquet(idx).filter(F.col("token_hash") == probe)
    plan = lookup._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(token_hash), EqualTo(token_hash" in plan


def test_ip_trie_fact_side_never_shuffles_before_agg(spark):
    """IPTrieDictionary plan contract: longest-prefix match is pure
    broadcast joins (one per distinct prefix length) + coalesce — the
    fact side must reach the lookup without a single hash exchange."""
    from pyspark.sql import functions as F

    from clickhouse_25_5_3_75_stable_spark.operators.dictionary import (
        IPTrieDictionary,
    )

    cidrs = spark.createDataFrame(
        [("10.0.0.0/8", "corp"), ("10.1.0.0/16", "dc1"),
         ("10.1.128.0/17", "hi")],
        "cidr string, zone string",
    )
    facts = spark.createDataFrame(
        [(f"10.{i % 3}.{i % 200}.{i % 250}",) for i in range(500)], "ip string"
    )
    d = IPTrieDictionary(cidrs, cidr="cidr")
    out = d.dict_get(facts, F.col("ip"), {"zone": "zone"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3  # one per distinct length
    # no fact-side repartitioning: every Exchange is a broadcast send
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"unexpected fact-side shuffle: {line.strip()}")


def test_polygon_dictionary_bbox_bnlj_plan(spark):
    """PolygonDictionary plan contract: broadcast nested-loop join with
    the bbox conjunct in the join condition (pruning before the exact
    ray-cast), and the only hash exchange is the documented row-identity
    overlap-dedup window."""
    from pyspark.sql import functions as F

    from clickhouse_25_5_3_75_stable_spark.operators.dictionary import (
        PolygonDictionary,
    )

    def ring(*pts):
        return [{"x": float(a), "y": float(b)} for a, b in pts]

    polys = spark.createDataFrame(
        [(1, "a", ring((0, 0), (4, 0), (4, 4), (0, 4)))],
        "pid int, zone string, verts array<struct<x:double,y:double>>",
    )
    facts = spark.createDataFrame(
        [(float(i % 10), float(i % 7)) for i in range(300)], "x double, y double"
    )
    d = PolygonDictionary(polys, key="pid", vertices="verts")
    out = d.dict_get(facts, F.col("x"), F.col("y"), {"zone": "zone"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    hash_ex = [l for l in plan.splitlines()
               if "Exchange hashpartitioning" in l]
    assert len(hash_ex) == 1 and "__pg_rowid" in hash_ex[0]


def test_incremental_dedup_semi_join_no_corpus_pairing(spark):
    """dedup_against_corpus plan contract (round-8): the corpus reduces
    to DISTINCT (band, key) feeding a semi join — NO self-join of the
    corpus, no Python, no cartesian."""
    from clickhouse_25_5_3_75_stable_spark.operators.dedup import (
        dedup_against_corpus,
    )

    docs = spark.createDataFrame(
        [(i, f"text body number {i % 17} with shared tokens {i % 5}")
         for i in range(200)],
        "doc_id int, text string",
    )
    out = dedup_against_corpus(
        docs.filter("doc_id < 100"), docs.filter("doc_id >= 100"),
        "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SemiJoin" in plan or "LeftSemi" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_keep_best_single_cluster_window(spark):
    """dedup_keep_best plan contract: ONE window pass over the cluster
    label (row_number + count share the partition), no Python."""
    from clickhouse_25_5_3_75_stable_spark.operators.dedup import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "doc_id int, score int")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 50, 2)], "id_a int, id_b int")
    out = dedup_keep_best(docs, pairs, id_col="doc_id", score_col="score")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("Window") <= 2  # row_number + count, same partition
