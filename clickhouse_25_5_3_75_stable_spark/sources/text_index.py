"""Token skip-index sidecar — the tokenbf_v1 analogue (SURVEY §2.1).

Reference: the token bloom-filter skip index
(/root/reference/src/Storages/MergeTree/MergeTreeIndices.cpp:123-157
tokenbf_v1 + /root/reference/src/Interpreters/ITokenExtractor.cpp:108
SplitTokenExtractor) — per-granule bloom over the text's tokens lets
hasToken/LIKE prune granules without reading them. Parquet has no
granule-level index hook, so the analogue here is a FILE-level sidecar
table: (token_hash → file) distinct pairs, built with one pass over
the table (tokenize → explode → distinct — all JVM expressions), and a
``has_token_scan`` that prunes files from the sidecar BEFORE the real
rlike pass runs.

Trade vs the reference: bloom filters admit false positives in O(m)
bits; the exact hash-pair sidecar admits none and costs
O(distinct tokens per file) rows of 8-byte hashes — at 100 TB that is
the classic inverted file-list, the right shape when token vocabulary
per file is bounded (natural-language text: ~10⁴-10⁵ distinct tokens
per multi-MB file). The lookup side reads the sidecar (itself pruned
by a hash equality pushed to parquet), collects only FILE PATHS
(bounded by file count, broadcast-class), and scans just those files —
the same I/O shape as granule skipping.

Tokenizer parity: a token is a maximal run of characters that are NOT
ASCII non-alphanumerics (SplitTokenExtractor treats every non-ASCII
byte as a token char). hasToken needles containing separators are
rejected, as the reference does (BAD_ARGUMENTS)."""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# maximal runs of "not (ASCII and not alphanumeric)" — token chars are
# ASCII alphanumerics plus every non-ASCII character
TOKEN_CHAR_CLASS = r"[^\x00-\x2f\x3a-\x40\x5b-\x60\x7b-\x7f]"
TOKEN_REGEX = TOKEN_CHAR_CLASS + "+"

_PY_TOKEN_RE = re.compile(TOKEN_REGEX)


def is_single_token(needle: str) -> bool:
    return bool(_PY_TOKEN_RE.fullmatch(needle))


def build_token_index(
    spark: SparkSession, table_path: str, text_col: str, index_path: str
) -> None:
    """Build the (token_hash, file) sidecar: one pass over the table,
    tokenize → explode → distinct → write. The distinct is the only
    shuffle and carries 8-byte hashes + file paths; sorting by hash
    makes the lookup's parquet scan min/max-prunable."""
    df = spark.read.parquet(table_path).select(
        F.input_file_name().alias("file"), F.col(text_col).alias("__t")
    )
    pairs = (
        df.select(
            "file",
            F.explode(
                F.regexp_extract_all(F.col("__t"), F.lit(TOKEN_REGEX), 0)
            ).alias("tok"),
        )
        .select("file", F.xxhash64(F.col("tok")).alias("token_hash"))
        .distinct()
    )
    (
        pairs.repartition(F.col("token_hash"))
        .sortWithinPartitions("token_hash")
        .write.mode("overwrite")
        .parquet(index_path)
    )


def token_index_files(
    spark: SparkSession, index_path: str, needle: str
) -> list[str]:
    """Files that (exactly) contain the token — the pruning set."""
    if not is_single_token(needle):
        raise ValueError(
            f"hasToken needle {needle!r} contains token separators "
            "(reference: BAD_ARGUMENTS — split the query per token)"
        )
    idx = spark.read.parquet(index_path)
    probe = (
        spark.range(1)
        .select(F.xxhash64(F.lit(needle)).alias("h"))
        .collect()[0]
        .h
    )
    # hash equality pushes down to the parquet scan of the sidecar;
    # the collect is file paths only — bounded by the table's file count
    return [
        r.file
        for r in idx.filter(F.col("token_hash") == probe).select("file").distinct().collect()
    ]


def has_token_scan(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    text_col: str,
    needle: str,
) -> DataFrame:
    """hasToken-accelerated scan: prune files via the sidecar, then run
    the exact hasToken predicate (dialect.py) over the survivors only.
    With no candidate files the result is empty without touching the
    table at all."""
    from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch

    schema = spark.read.parquet(table_path).schema
    files = token_index_files(spark, index_path, needle)
    if not files:
        return spark.createDataFrame([], schema)
    # basePath keeps directory-encoded partition columns resolvable
    # when scanning leaf files (review finding: they came back NULL
    # for partitioned layouts)
    return (
        spark.read.schema(schema)
        .option("basePath", table_path)
        .parquet(*files)
        .filter(ch("hasToken", F.col(text_col), needle))
    )


# ---------------------------------------------------------------------------
# ngrambf_v1 analogue: the same sidecar shape over character n-grams,
# accelerating substring predicates (LIKE '%needle%', position() > 0).
# A file can contain the needle only if it contains ALL of the
# needle's n-grams — the lookup intersects per-gram file lists
# (one small groupBy over the pruned sidecar scan). Reference:
# MergeTreeIndices.cpp ngrambf_v1 + ITokenExtractor.cpp:41
# NgramTokenExtractor.
# ---------------------------------------------------------------------------


def build_ngram_index(
    spark: SparkSession, table_path: str, text_col: str, index_path: str, n: int = 3
) -> None:
    """(gram_hash, file) distinct pairs over character n-grams — all
    JVM expressions (sequence → transform → explode), one distinct
    shuffle of 8-byte hashes."""
    df = spark.read.parquet(table_path).select(
        F.input_file_name().alias("file"), F.col(text_col).alias("__t")
    )
    # guard: sequence(1, 0) would run DESCENDING ([1, 0]) and emit two
    # junk sub-n grams per short row (review finding) — short strings
    # contribute nothing instead
    n_grams = F.length("__t") - (n - 1)
    grams = df.select(
        "file",
        F.explode(
            F.when(
                n_grams >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_grams),
                    lambda i: F.substring(F.col("__t"), i, n),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    pairs = grams.select("file", F.xxhash64(F.col("g")).alias("gram_hash")).distinct()
    (
        pairs.repartition(F.col("gram_hash"))
        .sortWithinPartitions("gram_hash")
        .write.mode("overwrite")
        .parquet(index_path)
    )


def ngram_index_files(
    spark: SparkSession, index_path: str, needle: str, n: int = 3
) -> list[str] | None:
    """Files that may contain the substring (every needle n-gram
    present). Returns None when the needle is shorter than n — no
    pruning possible, caller falls back to the full scan (the
    reference's ngrambf does the same)."""
    if len(needle) < n:
        return None
    grams = [needle[i : i + n] for i in range(len(needle) - n + 1)]
    uniq = sorted(set(grams))
    idx = spark.read.parquet(index_path)
    probe = (
        spark.range(1)
        .select(*[F.xxhash64(F.lit(g)).alias(f"h{i}") for i, g in enumerate(uniq)])
        .collect()[0]
    )
    hashes = [probe[f"h{i}"] for i in range(len(uniq))]
    rows = (
        idx.filter(F.col("gram_hash").isin(hashes))
        .groupBy("file")
        .agg(F.count_distinct("gram_hash").alias("k"))
        .filter(F.col("k") == len(hashes))
        .select("file")
        .collect()
    )
    return [r.file for r in rows]


def like_substring_scan(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    text_col: str,
    needle: str,
    n: int = 3,
) -> DataFrame:
    """LIKE '%needle%' accelerated by the n-gram sidecar: prune files
    (all-grams intersection), then run the exact contains() predicate
    over the survivors. Short needles fall back to the full scan."""
    schema = spark.read.parquet(table_path).schema
    files = ngram_index_files(spark, index_path, needle, n)
    if files is None:
        src = spark.read.parquet(table_path)
    elif not files:
        return spark.createDataFrame([], schema)
    else:
        src = (
            spark.read.schema(schema)
            .option("basePath", table_path)
            .parquet(*files)
        )
    return src.filter(F.col(text_col).contains(needle))


# ---------------------------------------------------------------------------
# gin / full_text analogue: POSITIONAL posting lists. Reference:
# MergeTreeIndices.cpp:123-157 registers the "gin"/"full_text" index
# whose GinFilter (src/Interpreters/GinFilter.h) stores token →
# posting lists (rowid ranges), enabling multi-token AND and phrase
# queries to prune without scanning. tokenbf/ngrambf above prune one
# token / one substring; this sidecar stores
# (token_hash, file, row id, ordinal positions[]) so a conjunction
# prunes to files containing ALL tokens and a phrase prunes to files
# containing the tokens at CONSECUTIVE ordinals — strictly fewer files
# than the per-token union. The final exact predicate still runs on
# the surviving files (same contract as the reference: skip indexes
# never replace the WHERE, they skip I/O).
#
# 100 TB shape: the build is one pass (tokenize → posexplode → groupBy
# (token_hash, file, row)) whose single shuffle carries 8-byte hashes;
# lookups read the sidecar with hash-equality pushdown, aggregate per
# (file[, row anchor]) and collect FILE PATHS only (bounded by file
# count, broadcast-class) — data rows are never collected.
# ---------------------------------------------------------------------------


def build_gin_index(
    spark: SparkSession,
    table_path: str,
    text_col: str,
    index_path: str,
    id_col: str,
) -> None:
    """Posting-list sidecar: (token_hash, file, row id, positions[])
    where positions are 0-based token ordinals in the row's token
    stream. One tokenize pass, one groupBy shuffle; sorted by
    token_hash for min/max pruning of the sidecar itself."""
    df = spark.read.parquet(table_path).select(
        F.input_file_name().alias("file"),
        F.col(id_col).alias("rid"),
        F.col(text_col).alias("__t"),
    )
    posting = (
        df.select(
            "file",
            "rid",
            F.posexplode(
                F.regexp_extract_all(F.col("__t"), F.lit(TOKEN_REGEX), 0)
            ).alias("pos", "tok"),
        )
        .groupBy(F.xxhash64(F.col("tok")).alias("token_hash"), "file", "rid")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )
    (
        posting.repartition(F.col("token_hash"))
        .sortWithinPartitions("token_hash")
        .write.mode("overwrite")
        .parquet(index_path)
    )


def _probe_hashes(spark: SparkSession, tokens: list[str]) -> list[int]:
    for tok in tokens:
        if not is_single_token(tok):
            raise ValueError(
                f"gin needle token {tok!r} contains separators "
                "(reference: BAD_ARGUMENTS)"
            )
    row = (
        spark.range(1)
        .select(*[F.xxhash64(F.lit(t)).alias(f"h{i}") for i, t in enumerate(tokens)])
        .collect()[0]
    )
    return [row[f"h{i}"] for i in range(len(tokens))]


def gin_and_files(
    spark: SparkSession, index_path: str, tokens: list[str]
) -> list[str]:
    """Files containing ALL tokens (multi-token AND pruning): hash-
    equality pushdown on the sidecar, per-file distinct-token count,
    keep count == k. Collects file paths only."""
    hashes = _probe_hashes(spark, tokens)
    idx = spark.read.parquet(index_path)
    rows = (
        idx.filter(F.col("token_hash").isin(hashes))
        .groupBy("file")
        .agg(F.count_distinct("token_hash").alias("k"))
        .filter(F.col("k") == len(set(hashes)))
        .select("file")
        .collect()
    )
    return [r.file for r in rows]


def gin_phrase_files(
    spark: SparkSession, index_path: str, phrase_tokens: list[str]
) -> list[str]:
    """Files containing the tokens at CONSECUTIVE ordinals somewhere in
    one row (phrase pruning). For phrase t0..t_{k-1}: explode each
    matching posting's positions, normalize to anchor = pos - i, and a
    row is a candidate when one anchor collects all k token indexes.
    Repeated tokens in the phrase are handled by joining the sidecar
    against the (i, hash) pairs, not a hash set."""
    hashes = _probe_hashes(spark, phrase_tokens)
    k = len(phrase_tokens)
    if k == 1:
        return gin_and_files(spark, index_path, phrase_tokens)
    probe = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "i int, token_hash long"
    )
    idx = spark.read.parquet(index_path)
    cand = (
        idx.filter(F.col("token_hash").isin(hashes))  # pushdown prune
        .join(F.broadcast(probe), "token_hash")  # recover phrase slots
        .select("file", "rid", "i", F.explode("positions").alias("pos"))
        .withColumn("anchor", F.col("pos") - F.col("i"))
        .filter(F.col("anchor") >= 0)
        .groupBy("file", "rid", "anchor")
        .agg(F.count_distinct("i").alias("nslots"))
        .filter(F.col("nslots") == k)
        .select("file")
        .distinct()
        .collect()
    )
    return [r.file for r in cand]


def _exact_phrase_predicate(text_col: str, phrase_tokens: list[str]):
    """Exact phrase check, all JVM expressions: the row's token stream
    contains the phrase tokens consecutively."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0)
    k = len(phrase_tokens)
    lit = F.array(*[F.lit(t) for t in phrase_tokens])
    n_anchor = F.size(toks) - (k - 1)
    return F.when(
        n_anchor >= 1,
        F.exists(
            F.sequence(F.lit(1), n_anchor),
            lambda i: F.slice(toks, i, k) == lit,
        ),
    ).otherwise(F.lit(False))


def gin_and_scan(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    text_col: str,
    tokens: list[str],
) -> DataFrame:
    """hasToken(a) AND hasToken(b) ... accelerated by the posting-list
    sidecar: prune to files containing every token, then run the exact
    per-token predicates on survivors."""
    from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch

    schema = spark.read.parquet(table_path).schema
    files = gin_and_files(spark, index_path, tokens)
    if not files:
        return spark.createDataFrame([], schema)
    out = (
        spark.read.schema(schema)
        .option("basePath", table_path)
        .parquet(*files)
    )
    for tok in tokens:
        out = out.filter(ch("hasToken", F.col(text_col), tok))
    return out


def gin_phrase_scan(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Phrase search accelerated by positional posting lists: prune to
    files where the tokens co-occur at consecutive ordinals, then run
    the exact token-subsequence predicate on survivors."""
    phrase_tokens = _PY_TOKEN_RE.findall(phrase)
    if not phrase_tokens:
        raise ValueError("phrase contains no tokens")
    schema = spark.read.parquet(table_path).schema
    files = gin_phrase_files(spark, index_path, phrase_tokens)
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .option("basePath", table_path)
        .parquet(*files)
        .filter(_exact_phrase_predicate(text_col, phrase_tokens))
    )


def table_file_count(spark: SparkSession, table_path: str) -> int:
    """Total data files in the table (for pruning assertions/metrics)."""
    return (
        spark.read.parquet(table_path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def default_index_path(table_path: str, text_col: str) -> str:
    """Sidecar location convention: alongside the table, like the
    reference keeps skip indices inside the part directory."""
    return os.path.join(table_path + "__tokenbf", text_col)
