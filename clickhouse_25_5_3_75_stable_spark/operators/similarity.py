"""Vector similarity search (SURVEY §4.2 `useVectorSearch`; reference
HNSW index at /root/reference/src/Storages/MergeTree/
MergeTreeIndexVectorSimilarity.h:14-43, distance functions at
src/Functions/array/arrayDistance.cpp).

Spark has no vector index, so the operator decomposes:

- exact path:  brute-force cosine top-k — a broadcast of the query
  vector + one pass over the embeddings + TakeOrderedAndProject.
  At 100 TB this is a full scan but embarrassingly parallel; it is
  also the correctness oracle for every ANN variant.
- ANN path:    random-hyperplane LSH — sign-bit bucket key per vector,
  candidates = same-bucket (or neighboring-probe) rows only. The
  bucket join is an equi-join shuffle on the bucket key; recall is
  tunable by planes/probes. (IVF via k-means centroids is the other
  classic; LSH needs no training pass, so it ships first.)

Determinism: dot products and norms accumulate per-element products in
DECIMAL — order-independent, so Spark and DuckDB agree bitwise (see
functions/statistics.py for the full argument). The final divide runs
in double on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(20,12)"  # |element product| <= ~1; scale 12 >> double ulp


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact (decimal-accumulated) dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC))
    # Accumulator stays at precision 25 so the add widens to (26,12)
    # without hitting Spark's 38-digit cap — a (38,12) acc would make
    # every intermediate sum round at scale 11 and drift off the
    # oracle. Cast back is exact (|sum| < 10^13).
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(25,12)"),
        lambda acc, p: (acc + p).cast("decimal(25,12)"),
    ).cast("double")


def dot_dec_sql(a: str, b: str) -> str:
    """DuckDB spelling of :func:`_dot_dec` (STRING-routed final cast —
    see functions/numeric.py)."""
    prods = (
        f"list_transform(range(1, len({a}) + 1),"
        f" i -> CAST(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) AS DECIMAL(20,12)))"
    )
    return f"CAST(CAST(list_aggregate({prods}, 'sum') AS STRING) AS DOUBLE)"


def cosine_similarity(a: Column, b: Column) -> Column:
    """cosineDistance complement (reference arrayDistance.cpp:702);
    cross-engine-exact via decimal moments."""
    return _dot_dec(a, b) / (F.sqrt(_dot_dec(a, a)) * F.sqrt(_dot_dec(b, b)))


def cosine_similarity_sql(a: str, b: str) -> str:
    return (
        f"{dot_dec_sql(a, b)}"
        f" / (sqrt({dot_dec_sql(a, a)}) * sqrt({dot_dec_sql(b, b)}))"
    )


def cosine_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the 1-row query, score every
    vector, TakeOrderedAndProject keeps k per partition then merges —
    no full sort, no shuffle of the scored set."""
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    scored = vectors.crossJoin(q).select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(vec · plane_p).
    Planes are fixed literals → deterministic, no training pass."""
    bits = []
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    vectors: DataFrame,
    query: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket.
    Sublinear work at scale (bucket fraction ≈ 2^-planes); recall gaps
    on bucket boundaries are the standard LSH trade — raise planes and
    union multiple plane-sets (probes) to tighten."""
    b = hyperplane_bucket(F.col(vec_col), planes)
    q = F.broadcast(
        query.select(
            F.col(vec_col).alias("__qvec"),
            hyperplane_bucket(F.col(vec_col), planes).alias("__qbucket"),
        )
    )
    scored = (
        vectors.withColumn("__bucket", b)
        .join(q, F.col("__bucket") == F.col("__qbucket"))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine >= threshold).

    With block_col (e.g. an LSH bucket or a label) the self-join is an
    equi-join per block — the scale path. Without it this is the exact
    O(n²) audit used as the small-scale oracle."""
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        *([F.col(block_col).alias("ba")] if block_col else []),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        *([F.col(block_col).alias("bb")] if block_col else []),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        cond = cond & (F.col("ba") == F.col("bb"))
    return (
        a.join(b, cond)
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
