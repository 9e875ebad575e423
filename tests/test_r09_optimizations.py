"""Round-9 optimization internals: each rewrite that changed an
operator's execution shape is pinned against a naive restatement of
the ORIGINAL semantics, so the faster path provably computes the same
values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("n_buckets", [1, 3, 16])
def test_prefix_sum_quantile_buckets_match_naive_cumsum(spark, n_buckets):
    """The bucketing is an implementation detail (round-9: literal
    quantile cuts; round-10: range-partition ids): the exclusive
    prefix sum must equal the naive single-window cumsum for ANY
    contiguous bucket placement — exercised across bucket counts on a
    skewed, gappy id distribution (where boundaries land unevenly and
    some buckets stay empty)."""
    from clickhouse_25_5_3_75_stable_spark.operators.corpus import (
        _exclusive_prefix_sum,
    )

    # skewed ids: dense cluster, a gap, a sparse tail; varied weights
    rows = [(i, (i * 7) % 13 + 1) for i in range(50)]
    rows += [(1000 + i * 97, (i % 5) + 2) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, w long").repartition(7)

    got = {
        r["doc_id"]: r["__cum_excl"]
        for r in _exclusive_prefix_sum(df, "doc_id", "w", n_buckets).collect()
    }
    naive, running = {}, 0
    for i, w in sorted(rows):
        naive[i] = running
        running += w
    assert got == naive


def test_fast_band_keys_produce_same_candidate_pairs(spark):
    """xxhash64 band keys (fast tier) must yield exactly the candidate
    pair set of the portable md5 keys: identical signature slices
    collide identically under either hash."""
    from clickhouse_25_5_3_75_stable_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + "extra tail"),               # near-dup of 1
            (3, "completely different words entirely unrelated text here"),
            (4, base),                               # exact dup of 1
            (5, "another unrelated document about spark and hashing"),
        ],
        "doc_id long, text string",
    )
    # fast=True changes the SALTED HASH too (xxhash64 signatures), so
    # compare fast banding against md5 banding OF THE SAME signatures:
    # run lsh_banded twice with fast band keys toggled via lsh_band_keys
    # on one shared signature relation.
    rows_per_band = 2
    sig = docs.select(
        F.col("doc_id").alias("doc"),
        D.minhash_from_hashes(
            F.transform(
                D.word_shingles_from_tokens(D.tokens(F.col("text"))),
                lambda x: F.xxhash64(x),
            ),
            8,
        ).alias("sig"),
    )

    def pairs(fast: bool) -> set:
        banded = sig.select(
            "doc",
            F.explode(
                D.lsh_band_keys(F.col("sig"), 4, rows_per_band, fast=fast)
            ).alias("bk"),
        ).select("doc", "bk.band", "bk.key")
        members = (
            banded.groupBy("band", "key")
            .agg(F.sort_array(F.collect_list("doc")).alias("ms"))
            .filter(F.size("ms") >= 2)
        )
        out = members.select(
            F.col("ms"), F.posexplode(F.col("ms")).alias("i", "a")
        ).select(
            F.col("a").alias("id_a"),
            F.explode(F.slice(F.col("ms"), F.col("i") + 2, F.size("ms"))).alias(
                "id_b"
            ),
        )
        return {(r.id_a, r.id_b) for r in out.distinct().collect()}

    fast_pairs, portable_pairs = pairs(True), pairs(False)
    assert fast_pairs == portable_pairs
    assert (1, 4) in fast_pairs  # exact dups must always collide


def test_lm_score_literal_unigram_map(spark):
    """The literal-map unigram lookup (continuation session) must
    produce the EXACT per-doc scores of the broadcast-join path it
    replaced — including when the corpus contains a literal '<unk>'
    token that makes the vocabulary (its own count and the OOV fold
    merge, exactly as the grouped fold merged them)."""
    from clickhouse_25_5_3_75_stable_spark.operators.corpus import (
        bigram_lm,
        lm_score,
    )

    texts = [
        "a b a <unk> a b",       # literal <unk> token in the corpus
        "b b a q z",             # q/z fold to <unk>
        "c a a b x <unk>",
        "x y a b c",
        "a",
    ]
    train = spark.createDataFrame([(t,) for t in texts], "text string")
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts + ["zz <unk> a never seen"])],
        "doc_id long, text string",
    )
    model = bigram_lm(train, vocab_size=4)
    assert "uni_counts" in model
    # uni_counts must equal the joined-aggregate unigram table exactly
    from_df = {r.w1: r.uni_count for r in model["unigrams"].collect()}
    assert model["uni_counts"] == from_df

    # no-OOV corpus (round-10, per round-9 advice): the fold produces
    # no '<unk>' group, so the dict must not carry a synthetic zero
    # entry the unigrams DataFrame does not have
    tiny = spark.createDataFrame([("a b a",), ("b a",)], "text string")
    m2 = bigram_lm(tiny, vocab_size=4)
    assert m2["uni_counts"] == {
        r.w1: r.uni_count for r in m2["unigrams"].collect()
    }
    assert "<unk>" not in m2["uni_counts"]
    # scoring an OOV doc under the no-OOV model: map miss degrades to
    # the join-miss 0 count (try_element_at under ANSI), same scores
    oov_docs = spark.createDataFrame([(0, "a zz b")], "doc_id long, text string")
    s_map = lm_score(oov_docs, m2).collect()[0]
    s_join = lm_score(
        oov_docs, {k: v for k, v in m2.items() if k != "uni_counts"}
    ).collect()[0]
    assert (s_map.n_bigrams, s_map.n_oov, s_map.model_hits) == (
        s_join.n_bigrams, s_join.n_oov, s_join.model_hits)
    assert s_map.logprob == pytest.approx(s_join.logprob, rel=1e-12)

    got_map = {
        r.doc_id: (r.n_bigrams, r.n_oov, r.model_hits, r.logprob, r.perplexity)
        for r in lm_score(docs, model).collect()
    }
    legacy = {k: v for k, v in model.items() if k != "uni_counts"}
    got_join = {
        r.doc_id: (r.n_bigrams, r.n_oov, r.model_hits, r.logprob, r.perplexity)
        for r in lm_score(docs, legacy).collect()
    }
    # integer columns exact; float sums approx (aggregation order is
    # only incidentally identical between the two plans — round-9
    # advice: don't pin partitioning/AQE accidents)
    assert set(got_map) == set(got_join)
    for d in got_map:
        assert got_map[d][:3] == got_join[d][:3]
        assert got_map[d][3] == pytest.approx(got_join[d][3], rel=1e-12)
        assert got_map[d][4] == pytest.approx(got_join[d][4], rel=1e-12)


def test_bigram_lm_single_pass_equals_direct_recount(spark):
    """The single-pass model (vocab + folded counts derived from the
    raw-pair aggregate) must equal a direct recount: explode tokens,
    pick top-V by (count DESC, token ASC), fold, count bigrams and
    unigrams over instances."""
    from collections import Counter

    from clickhouse_25_5_3_75_stable_spark.operators.corpus import bigram_lm

    texts = [
        "a b a c a b",
        "b b a",
        "c a a b x",
        "x y a b c",
        "a",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    V = 3
    model = bigram_lm(docs, text_col="text", vocab_size=V)

    # direct recount in python
    toks = [t.split(" ") for t in texts]
    counts = Counter(w for ts in toks for w in ts)
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    vocab_set = {w for w, _ in vocab}
    fold = lambda w: w if w in vocab_set else "<unk>"  # noqa: E731
    uni = Counter(fold(w) for ts in toks for w in ts)
    bi = Counter(
        (fold(a), fold(b)) for ts in toks for a, b in zip(ts, ts[1:])
    )

    assert model["vocab_list"] == [w for w, _ in vocab]
    got_uni = {
        r.w1: r.uni_count for r in model["unigrams"].collect()
    }
    assert got_uni == dict(uni)
    got_bi = {
        (r.w1, r.w2): r.pair_count for r in model["bigrams"].collect()
    }
    assert got_bi == dict(bi)
