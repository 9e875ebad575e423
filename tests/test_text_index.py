"""Token skip-index sidecar (sources/text_index.py — the tokenbf_v1
analogue): pruning actually reduces files read, results stay exact,
separators are rejected, layout-write integration builds the sidecar.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_25_5_3_75_stable_spark.functions.dialect import ch
from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
    build_token_index,
    default_index_path,
    has_token_scan,
    table_file_count,
    token_index_files,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def indexed_table(spark, tmp_path_factory):
    """documents written as MANY small files + a token sidecar."""
    base = tmp_path_factory.mktemp("tokenbf")
    table = str(base / "docs")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # rare marker tokens concentrated in a few rows → strong pruning
    marked = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 40 == 0,
            F.concat(F.col("text"), F.lit(" zebrafinch")),
        ).otherwise(F.col("text")),
    )
    (
        marked.repartition(8, "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 16)
        .parquet(table)
    )
    idx = str(base / "idx")
    build_token_index(spark, table, "text", idx)
    return table, idx


def test_pruning_reads_fewer_files(spark, indexed_table):
    table, idx = indexed_table
    total = table_file_count(spark, table)
    cand = token_index_files(spark, idx, "zebrafinch")
    assert 0 < len(cand) < total, (len(cand), total)


def test_result_equals_full_scan(spark, indexed_table):
    table, idx = indexed_table
    via_index = {
        r.doc_id
        for r in has_token_scan(spark, table, idx, "text", "zebrafinch").collect()
    }
    full = {
        r.doc_id
        for r in spark.read.parquet(table)
        .filter(ch("hasToken", F.col("text"), "zebrafinch"))
        .collect()
    }
    assert via_index == full and via_index  # non-empty and identical
    # a common token also stays exact (prunes little, loses nothing)
    via_index = {
        r.doc_id for r in has_token_scan(spark, table, idx, "text", "data").collect()
    }
    full = {
        r.doc_id
        for r in spark.read.parquet(table)
        .filter(ch("hasToken", F.col("text"), "data"))
        .collect()
    }
    assert via_index == full


def test_absent_token_scans_nothing(spark, indexed_table):
    table, idx = indexed_table
    assert token_index_files(spark, idx, "qqzzyyxx") == []
    out = has_token_scan(spark, table, idx, "text", "qqzzyyxx")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        f.name for f in spark.read.parquet(table).schema.fields
    ]


def test_hastoken_boundary_semantics(spark):
    """dialect hasToken must agree with the reference's separator set
    (HasTokenImpl via SplitTokenExtractor): '_' IS a separator, non-
    ASCII chars are TOKEN chars — both differ from regex \\b (review
    finding: the old \\b predicate disagreed with the index tokenizer
    on exactly these)."""
    df = spark.createDataFrame(
        [("data_base",), ("the data set",), ("πdataπ",), ("dataset",)],
        "text string",
    )
    got = {
        r.text: r.h
        for r in df.select(
            "text", ch("hasToken", F.col("text"), "data").alias("h")
        ).collect()
    }
    assert got["data_base"] is True  # '_' separates (\\b said no)
    assert got["the data set"] is True
    assert got["πdataπ"] is False  # non-ASCII extends the token (\\b said yes)
    assert got["dataset"] is False


def test_indexed_scan_agrees_on_boundary_cases(spark, tmp_path):
    """Indexed and unindexed hasToken must agree on the tokenizer's
    edge cases — the pruning tokenizer and the predicate share one
    separator definition."""
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        build_token_index,
    )

    df = spark.createDataFrame(
        [(1, "data_base x"), (2, "πdataπ y"), (3, "plain data here"), (4, "none")],
        "doc_id int, text string",
    )
    table = str(tmp_path / "edge")
    df.repartition(4).write.mode("overwrite").parquet(table)
    idx = str(tmp_path / "edge_idx")
    build_token_index(spark, table, "text", idx)
    via_index = {
        r.doc_id for r in has_token_scan(spark, table, idx, "text", "data").collect()
    }
    full = {
        r.doc_id
        for r in spark.read.parquet(table)
        .filter(ch("hasToken", F.col("text"), "data"))
        .collect()
    }
    assert via_index == full == {1, 3}


def test_partitioned_layout_keeps_partition_columns(spark, tmp_path):
    """Pruned scans over a partitioned layout must resolve the
    directory-encoded partition columns (review finding: they came
    back NULL without basePath)."""
    from clickhouse_25_5_3_75_stable_spark.sources.layout import (
        write_mergetree_layout,
    )
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        build_token_index,
        default_index_path,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(200)
    docs = docs.withColumn("bucket", (F.col("doc_id") % 3).cast("int"))
    table = str(tmp_path / "ptab")
    write_mergetree_layout(
        docs, table, order_by=["doc_id"], partition_by=["bucket"],
        token_index_cols=["text"],
    )
    idx = default_index_path(table, "text")
    out = has_token_scan(spark, table, idx, "text", "data")
    assert "bucket" in out.columns
    rows = out.select("doc_id", "bucket").collect()
    assert rows and all(r.bucket is not None for r in rows)
    want = {
        (r.doc_id, r.bucket)
        for r in spark.read.parquet(table)
        .filter(ch("hasToken", F.col("text"), "data"))
        .select("doc_id", "bucket")
        .collect()
    }
    assert {(r.doc_id, r.bucket) for r in rows} == want


def test_separator_needle_rejected(spark, indexed_table):
    table, idx = indexed_table
    with pytest.raises(ValueError, match="separator"):
        token_index_files(spark, idx, "two words")
    with pytest.raises(ValueError, match="separator"):
        token_index_files(spark, idx, "semi;colon")


def test_ngram_index_substring_scan(spark, indexed_table, tmp_path):
    """ngrambf_v1 analogue: LIKE '%needle%' prunes via the all-grams
    intersection and stays exact; short needles fall back to a full
    scan rather than wrong pruning."""
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        build_ngram_index,
        like_substring_scan,
        ngram_index_files,
    )

    table, _ = indexed_table
    idx = str(tmp_path / "ngram_idx")
    build_ngram_index(spark, table, "text", idx)

    total = table_file_count(spark, table)
    cand = ngram_index_files(spark, idx, "zebrafinch")
    assert cand is not None and 0 < len(cand) < total

    got = {
        r.doc_id
        for r in like_substring_scan(spark, table, idx, "text", "zebrafinch").collect()
    }
    want = {
        r.doc_id
        for r in spark.read.parquet(table)
        .filter(F.col("text").contains("zebrafinch"))
        .collect()
    }
    assert got == want and got

    # substring spanning a word boundary (tokens can't do this)
    got2 = {
        r.doc_id
        for r in like_substring_scan(spark, table, idx, "text", " zebrafinch").collect()
    }
    assert got2 == want  # marker always follows a space

    # needle shorter than n → full-scan fallback, still exact
    assert ngram_index_files(spark, idx, "ab") is None
    short = like_substring_scan(spark, table, idx, "text", "ab")
    full_short = spark.read.parquet(table).filter(F.col("text").contains("ab"))
    assert short.count() == full_short.count()

    # absent substring with valid grams → zero files, empty result
    assert ngram_index_files(spark, idx, "qqqzzzyyy") == []
    assert like_substring_scan(spark, table, idx, "text", "qqqzzzyyy").count() == 0


def test_layout_write_builds_sidecar(spark, tmp_path):
    from clickhouse_25_5_3_75_stable_spark.sources.layout import (
        write_mergetree_layout,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
    table = str(tmp_path / "t")
    write_mergetree_layout(
        docs, table, order_by=["doc_id"], token_index_cols=["text"]
    )
    idx = default_index_path(table, "text")
    got = {
        r.doc_id for r in has_token_scan(spark, table, idx, "text", "data").collect()
    }
    want = {
        r.doc_id
        for r in docs.filter(ch("hasToken", F.col("text"), "data")).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# gin / full_text positional posting lists
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gin_table(spark, tmp_path_factory):
    """documents + planted phrases, many small files, gin sidecar."""
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        build_gin_index,
    )

    base = tmp_path_factory.mktemp("gin")
    table = str(base / "docs")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # 'lobster bisque' planted in few rows; 'lobster' alone and
    # 'bisque' alone in (different) other rows -> AND prunes, phrase
    # prunes strictly harder
    marked = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 97 == 0,
               F.concat(F.col("text"), F.lit(" lobster bisque tail")))
        .when(F.col("doc_id") % 11 == 0,
              F.concat(F.col("text"), F.lit(" lobster pot")))
        .when(F.col("doc_id") % 13 == 0,
              F.concat(F.col("text"), F.lit(" bisque bowl")))
        .when(F.col("doc_id") % 17 == 0,
              F.concat(F.col("text"), F.lit(" bisque near lobster")))
        .otherwise(F.col("text")),
    )
    (
        marked.repartition(16, "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 8)
        .parquet(table)
    )
    idx = str(base / "idx")
    build_gin_index(spark, table, "text", idx, "doc_id")
    return table, idx


def test_gin_and_prunes_and_phrase_prunes_harder(spark, gin_table):
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        gin_and_files,
        gin_phrase_files,
        token_index_files,
    )

    table, idx = gin_table
    total = table_file_count(spark, table)
    # single-token candidates via the same posting lists
    only_lobster = gin_and_files(spark, idx, ["lobster"])
    both = gin_and_files(spark, idx, ["lobster", "bisque"])
    phrase = gin_phrase_files(spark, idx, ["lobster", "bisque"])
    assert 0 < len(both) < len(only_lobster) < total
    # phrase candidates are a subset of the AND candidates and strictly
    # fewer (rows with both words non-adjacent exist by construction)
    assert set(phrase) <= set(both)
    assert 0 < len(phrase) < len(both)
    _ = token_index_files  # tokenbf covered above


def test_gin_and_scan_exact(spark, gin_table):
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        gin_and_scan,
    )

    table, idx = gin_table
    via_index = {
        r.doc_id
        for r in gin_and_scan(spark, table, idx, "text",
                              ["lobster", "bisque"]).collect()
    }
    full = {
        r.doc_id
        for r in spark.read.parquet(table)
        .filter(ch("hasToken", F.col("text"), "lobster")
                & ch("hasToken", F.col("text"), "bisque"))
        .collect()
    }
    assert via_index == full and via_index


def test_gin_phrase_scan_exact(spark, gin_table):
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        gin_phrase_scan,
    )

    table, idx = gin_table
    via_index = {
        r.doc_id
        for r in gin_phrase_scan(spark, table, idx, "text",
                                 "lobster bisque").collect()
    }
    # ground truth: doc_ids planted with the adjacent phrase only
    full = {
        r.doc_id
        for r in spark.read.parquet(table)
        .filter(F.col("text").rlike(r"\blobster bisque\b"))
        .collect()
    }
    assert via_index == full and via_index
    # the non-adjacent rows ('bisque near lobster') must NOT match
    near = {
        r.doc_id
        for r in spark.read.parquet(table)
        .filter(F.col("text").contains("bisque near lobster"))
        .collect()
    }
    assert near and not (near & via_index)


def test_gin_phrase_repeated_token(spark, gin_table):
    """A phrase with a repeated token must anchor BOTH slots —
    'bisque bisque' never occurs even though 'bisque' does twice in
    separate places."""
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        gin_phrase_scan,
    )

    table, idx = gin_table
    assert gin_phrase_scan(spark, table, idx, "text",
                           "bisque bisque").count() == 0


def test_gin_phrase_no_match_skips_table(spark, gin_table):
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        gin_phrase_files,
        gin_phrase_scan,
    )

    table, idx = gin_table
    assert gin_phrase_files(spark, idx, ["zzzznope", "lobster"]) == []
    assert gin_phrase_scan(spark, table, idx, "text",
                           "zzzznope lobster").count() == 0


def test_gin_rejects_separator_tokens(spark, gin_table):
    from clickhouse_25_5_3_75_stable_spark.sources.text_index import (
        gin_and_files,
    )

    _table, idx = gin_table
    with pytest.raises(ValueError):
        gin_and_files(spark, idx, ["a b"])
