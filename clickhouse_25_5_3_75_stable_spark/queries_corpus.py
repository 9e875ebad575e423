"""Registry entries: corpus-level training-data pipeline — test-set
contamination, TF-IDF / BM25 scoring, token-budget shard packing.
Imported by queries.py for its side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.operators.corpus import (
    bm25_scores,
    contamination_report,
    pack_token_shards,
    tfidf_top_terms,
)
from clickhouse_25_5_3_75_stable_spark.operators.text import (
    tokens_sql,
    word_shingles_sql,
)
from clickhouse_25_5_3_75_stable_spark.queries import register, t

_SHINGLES = word_shingles_sql("text", 3)
_TOKS = tokens_sql("text")


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH test_sh AS (
        SELECT DISTINCT unnest({_SHINGLES}) AS sh
        FROM documents WHERE doc_id % 5 = 0
    ),
    train_sh AS (
        SELECT doc_id, unnest({_SHINGLES}) AS sh
        FROM documents WHERE doc_id % 5 <> 0
    ),
    totals AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM train_sh GROUP BY doc_id
    ),
    hits AS (
        SELECT t.doc_id, COUNT(*) AS n_contaminated
        FROM train_sh t WHERE t.sh IN (SELECT sh FROM test_sh)
        GROUP BY t.doc_id
    )
    SELECT totals.doc_id, totals.n_shingles,
           COALESCE(hits.n_contaminated, 0) AS n_contaminated
    FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
    WHERE COALESCE(hits.n_contaminated, 0) > 0
    ORDER BY totals.doc_id
    """,
    bucket="heavy",
    tags=("pipeline", "dedup", "contamination"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (the published LLM recipe: flag train
    docs sharing any k-token shingle with the held-out set). Eval split
    = doc_id % 5 == 0 here; shingle shape mirrors reference
    wordShingle* (FunctionsStringHash.cpp:587). Eval shingle hashes
    broadcast; train side is one explode + semi-join + count."""
    docs = t(spark, sf_dir, "documents")
    test = docs.filter(F.col("doc_id") % 5 == 0)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    rep = contamination_report(train, test, "doc_id", "text", k=3)
    return (
        rep.filter(F.col("n_contaminated") > 0)
        .select("doc_id", "n_shingles", "n_contaminated")
        .orderBy("doc_id")
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
               tf.tf * ln(CAST(n.n AS DOUBLE) / dfq.df) AS score
        FROM tf, dfq, n WHERE tf.term = dfq.term
    ),
    ranked AS (
        SELECT doc_id, term, tf, df,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term ASC) AS INTEGER) AS rank,
               ROUND(score, 4) AS score_r
        FROM scored
    )
    SELECT doc_id, rank, term, tf, df, score_r
    FROM ranked WHERE rank <= 3 AND doc_id < 60
    ORDER BY doc_id, rank
    """,
    bucket="heavy",
    tags=("pipeline", "text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (deterministic tie-break on
    term). idf uses exact integer N/df; ln rounds to 4dp for the
    cross-engine hash (convention of func_math_family). Output
    restricted to doc_id<60 to keep the gate row count sane — the full
    plan runs corpus-wide."""
    docs = t(spark, sf_dir, "documents")
    top = tfidf_top_terms(docs, top_k=3)
    return (
        top.filter(F.col("doc_id") < 60)
        .select(
            "doc_id",
            "rank",
            "term",
            "tf",
            "df",
            F.round(F.col("score"), 4).alias("score_r"),
        )
        .orderBy("doc_id", "rank")
    )


@register(
    "retrieval_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ),
    dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
    stats AS (SELECT SUM(dl) AS sum_dl, COUNT(*) AS n_docs FROM dl),
    tf AS (
        SELECT t.doc_id, u.term, COUNT(*) AS tf
        FROM toks t, unnest(t.tk) AS u(term)
        WHERE u.term IN ('spark', 'hash', 'merge')
        GROUP BY t.doc_id, u.term
    ),
    dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                 * (tf.tf * (1.2 + 1.0))
                 / (tf.tf + 1.2 * (1.0 - 0.75
                     + 0.75 * CAST(dl.dl AS DOUBLE) * CAST(stats.n_docs AS DOUBLE)
                       / CAST(stats.sum_dl AS DOUBLE))) AS term_score
        FROM tf, dfq, dl, stats
        WHERE tf.term = dfq.term AND tf.doc_id = dl.doc_id
    ),
    agg AS (
        SELECT doc_id, ROUND(SUM(term_score), 4) AS bm25,
               COUNT(*) AS n_query_terms_hit
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, bm25, n_query_terms_hit
    FROM agg
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 15
    """,
    bucket="heavy",
    tags=("pipeline", "text", "bm25"),
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-15 for a fixed 3-term query. The exploded token
    stream filters to query terms before any shuffle, so per-doc work
    is O(|q|); top-k is TakeOrdered, no global sort."""
    docs = t(spark, sf_dir, "documents")
    scored = bm25_scores(docs, ["spark", "hash", "merge"])
    return (
        scored.select(
            "doc_id",
            F.round(F.col("bm25"), 4).alias("bm25"),
            "n_query_terms_hit",
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(15)
    )


@register(
    "pack_token_budget_shards",
    oracle=f"""
    WITH dl AS (
        SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_excl
        FROM dl
    ),
    shards AS (
        SELECT doc_id, n_tokens,
               CAST(FLOOR(cum_excl / 2000.0) AS BIGINT) AS shard_id
        FROM cum
    )
    SELECT shard_id, COUNT(*) AS n_docs,
           -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT; Spark stays
           -- BIGINT and the driver row hash is dtype-sensitive (r03 red)
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM shards GROUP BY shard_id ORDER BY shard_id
    """,
    bucket="heavy",
    tags=("pipeline", "packing"),
)
def pack_token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget training-shard packing: sequential fill in doc_id
    order at 2000 tokens/shard via a DISTRIBUTED two-phase prefix sum
    (per-bucket partials -> bounded offset collect -> broadcast), never
    a single-task global window. The oracle restates the semantics as
    the naive global-window cumsum — equality proves the distributed
    decomposition exact."""
    from clickhouse_25_5_3_75_stable_spark.operators.text import tokens as _tokens

    docs = t(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens")
    )
    packed = pack_token_shards(weighted, budget=2000, n_buckets=16)
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


@register(
    "chunk_documents_windows",
    oracle=f"""
    WITH st AS (
        SELECT doc_id, {_TOKS} AS tk, len({_TOKS}) AS n FROM documents
        WHERE doc_id < 80
    ),
    chunks AS (
        SELECT st.doc_id,
               CAST((u.s - 1) / 30 AS INT) AS chunk_id,
               list_slice(st.tk, u.s, least(u.s + 39, st.n)) AS chunk
        FROM st, unnest(range(1, greatest(st.n - 10, 1) + 1, 30)) AS u(s)
    )
    SELECT doc_id, chunk_id,
           CAST(len(chunk) AS INTEGER) AS n_tokens,
           COALESCE(array_to_string(chunk, ' '), '') AS chunk_text
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
    bucket="light",
    tags=("pipeline", "chunking"),
)
def chunk_documents_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-embedding chunking: 40-token windows, 10-token overlap —
    pure flatMap, zero shuffles (chunking must inherit partitioning so
    the downstream embedding UDF reads local data)."""
    from clickhouse_25_5_3_75_stable_spark.operators.corpus import chunk_documents

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    return chunk_documents(docs, chunk_tokens=40, overlap=10).orderBy(
        "doc_id", "chunk_id"
    )


@register(
    "pipeline_quality_dedup_pack",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, text,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CASE WHEN len({_TOKS}) > 0
                    THEN CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                         / CAST(len({_TOKS}) AS DOUBLE)
                    ELSE 0.0 END AS uniq_ratio
        FROM documents
    ),
    kept AS (
        SELECT * FROM feat WHERE n_tokens >= 20 AND uniq_ratio >= 0.2
    ),
    deduped AS (
        SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens
        FROM kept GROUP BY md5(text)
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_excl
        FROM deduped
    )
    SELECT CAST(FLOOR(cum_excl / 3000.0) AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (driver hash)
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM cum GROUP BY shard_id ORDER BY shard_id
    """,
    bucket="heavy",
    tags=("pipeline", "composite"),
)
def pipeline_quality_dedup_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline in one plan: quality filter
    (token count + uniqueness ratio) → exact dedup (md5 digest, lowest
    doc_id survives) → token-budget shard packing via the distributed
    prefix sum. Three stages, three shuffles (dedup groupBy, bucket
    totals, shard agg) — the whole pipeline stays declarative, so
    Catalyst pipelines the filter into the scan and AQE sizes every
    exchange. The oracle restates all three stages independently."""
    from clickhouse_25_5_3_75_stable_spark.operators.text import quality_features

    docs = t(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    kept = docs.select(
        "doc_id",
        "text",
        feats["n_tokens"].alias("n_tokens"),
        feats["uniq_token_ratio"].alias("uniq_ratio"),
    ).filter((F.col("n_tokens") >= 20) & (F.col("uniq_ratio") >= 0.2))
    deduped = (
        kept.groupBy(F.md5(F.col("text")).alias("__digest"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .drop("__digest")
    )
    packed = pack_token_shards(deduped, budget=3000, n_buckets=16)
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )
