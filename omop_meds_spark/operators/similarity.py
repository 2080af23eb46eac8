"""Approximate-nearest-neighbor search over an embedding column.

Two paths:

* **brute-force top-k** (the exact baseline): broadcast the (small) query
  set against the corpus, score each pair, window-rank per query. Scoring
  uses an *integer-quantized dot product* — each float element is
  ``floor(x * 10000)`` (floor, not round: floor is identical in every
  engine/IEEE mode) and the dot is exact int64 math — so ranks are
  bit-reproducible in DuckDB and across any partitioning. At 100 TB the
  corpus side stays partitioned; only queries broadcast; the per-partition
  work is an Arrow-friendly columnar scan.
* **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (hyperplanes derived deterministically from md5, materialized as a tiny
  broadcast dimension) bucket the corpus; a query only scores its bucket's
  candidates — sublinear candidate sets at the cost of recall, which the
  tests measure against the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 10_000  # fixed-point scale for cross-engine-exact float handling


def quantized_col(emb_col) -> F.Column:
    c = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def int_dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by quantized dot product. Returns
    (query_id, rank, neighbor_id, score) — self-matches excluded."""
    from pyspark.sql import Window as W

    c = corpus.select(F.col(id_col).alias("neighbor_id"), quantized_col(emb_col).alias("c_emb"))
    q = queries.select(F.col(id_col).alias("query_id"), quantized_col(emb_col).alias("q_emb"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            int_dot(F.col("q_emb"), F.col("c_emb")).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


# ----------------------------------------------------------------- LSH ANN
def hyperplanes(spark, dim: int, n_planes: int) -> DataFrame:
    """Deterministic pseudo-random hyperplanes as a tiny dimension table:
    component (plane, d) = (md5_60bit(f"{plane}|{d}") % 2001) - 1000."""
    rows = [(p, d) for p in range(n_planes) for d in range(dim)]
    df = spark.createDataFrame(rows, "plane int, dim int")
    from ..functions.text import md5_long

    comp = (
        F.pmod(md5_long(F.concat_ws("|", F.col("plane"), F.col("dim"))), F.lit(2001)) - 1000
    )
    return df.withColumn("w", comp.cast("long"))


def lsh_bucket(df: DataFrame, planes: DataFrame, id_col: str, emb_col: str) -> DataFrame:
    """Bucket id = sign-bit string over the hyperplanes (posexplode + join +
    two-level agg — all shuffles keyed, no Python)."""
    exploded = df.select(
        F.col(id_col).alias("id"), F.posexplode(quantized_col(emb_col)).alias("dim", "x")
    )
    proj = (
        exploded.join(F.broadcast(planes), "dim")
        .groupBy("id", "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    return proj.groupBy("id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("plane"), (F.col("dot") > 0).cast("int").alias("b")))
                ),
                lambda s: s["b"].cast("string"),
            ),
        ).alias("bucket")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    spark,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k restricted to same-bucket candidates.

    ``dim`` (embedding dimensionality) is required — it parameterizes the
    hyperplane dimension table and cannot be inferred from the schema
    (``array<float>`` carries no length). Exact DuckDB oracle:
    oracles.py ``ann_lsh_topk``."""
    from pyspark.sql import Window as W

    if dim is None:
        raise ValueError("lsh_ann_topk requires explicit dim (embedding length)")
    planes = hyperplanes(spark, dim, n_planes)
    cb = lsh_bucket(corpus, planes, id_col, emb_col).withColumnRenamed("id", "neighbor_id")
    qb = lsh_bucket(queries, planes, id_col, emb_col).withColumnRenamed("id", "query_id")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), quantized_col(emb_col).alias("c_emb")).join(
        cb, "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), quantized_col(emb_col).alias("q_emb")).join(
        qb, "query_id"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", int_dot(F.col("q_emb"), F.col("c_emb")).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    spark,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup family):
    LSH-bucketed candidate generation (same hyperplane buckets as the ANN
    path — only same-bucket pairs are scored, never all-pairs) + exact
    quantized-cosine verification.

    Cosine = int_dot / (sqrt(|a|²) * sqrt(|b|²)) over the floor-quantized
    vectors — integer dots and squared norms are exact, and IEEE sqrt /
    multiply / divide are correctly rounded, so the double is bit-identical
    across engines (exact DuckDB oracle: ``embedding_near_dup``).

    Scale: the bucket join shuffles on the bucket key; random-hyperplane
    buckets split the corpus ~2^n_planes ways, so within-bucket pair
    counts stay bounded as n_planes grows with corpus size (the same
    recall/cost dial as the ANN path)."""
    if dim is None:
        raise ValueError("cosine_near_dup_pairs requires explicit dim")
    planes = hyperplanes(spark, dim, n_planes)
    buckets = lsh_bucket(corpus, planes, id_col, emb_col)
    q = corpus.select(F.col(id_col).alias("id"), quantized_col(emb_col).alias("e")).join(
        buckets, "id"
    )
    a = q.select(F.col("id").alias("id_a"), F.col("e").alias("ea"), "bucket")
    b = q.select(F.col("id").alias("id_b"), F.col("e").alias("eb"), "bucket")

    def norm(e: F.Column) -> F.Column:
        return F.sqrt(int_dot(e, e).cast("double"))

    cos = int_dot(F.col("ea"), F.col("eb")).cast("double") / (
        norm(F.col("ea")) * norm(F.col("eb"))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
