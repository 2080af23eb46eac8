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
  bucket the corpus; a query only scores its bucket's candidates —
  sublinear candidate sets at the cost of recall, which the tests measure
  against the brute-force baseline.

Signature shape (the 100 TB-critical part): hyperplane weights are
deterministic md5 values, so they are computed DRIVER-SIDE and baked into
the plan as per-plane array literals. Each plane's dot is then narrow
Column algebra — ``aggregate(zip_with(emb, lit(w), x*y))`` — making the
whole signature a ZERO-EXCHANGE projection over the corpus (plan-asserted
in tests/test_plans.py). The earlier shape (posexplode every embedding
into (id, dim, x) rows + two keyed shuffles) moved corpus×dim rows through
the shuffle — a ~1000× row blowup at real embedding widths (768–1024) for
an operator whose output is one short string per document.
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
def plane_weights(dim: int, n_planes: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplane weights, computed driver-side:
    component (plane, d) = (md5_60bit(f"{plane}|{d}") % 2001) - 1000, where
    md5_60bit = int(md5hex[:15], 16) — bit-identical to the engine's
    ``md5_long`` Column (functions/text.py:162) and to the DuckDB oracle's
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``. n_planes·dim ints total —
    a few KB even at dim=1024 — baked into the plan as literals, so no
    dimension table, no join, no shuffle."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:15], 16) % 2001) - 1000
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_col(qemb: F.Column, weights: list[list[int]]) -> F.Column:
    """Bucket id = sign-bit string over the hyperplanes, as a single narrow
    Column expression over an already-quantized embedding: per plane,
    ``aggregate(zip_with(qemb, lit(w_p), x*y)) > 0``. Zero exchanges — the
    signature is a projection, exactly like simhash_col (dedup.py)."""
    bits = [
        (int_dot(qemb, F.array(*[F.lit(w).cast("long") for w in row])) > 0)
        .cast("int")
        .cast("string")
        for row in weights
    ]
    return F.concat(*bits)


def lsh_bucket(df: DataFrame, weights: list[list[int]], id_col: str, emb_col: str) -> DataFrame:
    """(id, bucket) per row — a shuffle-free projection."""
    return df.select(
        F.col(id_col).alias("id"),
        lsh_bucket_col(quantized_col(emb_col), weights).alias("bucket"),
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
    weights = plane_weights(dim, n_planes)
    # bucket is a projection column on each side — no join-back, no shuffle
    # before the (broadcast) bucket join
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantized_col(emb_col).alias("c_emb")
    ).withColumn("bucket", lsh_bucket_col(F.col("c_emb"), weights))
    q = queries.select(
        F.col(id_col).alias("query_id"), quantized_col(emb_col).alias("q_emb")
    ).withColumn("bucket", lsh_bucket_col(F.col("q_emb"), weights))
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
    weights = plane_weights(dim, n_planes)
    q = corpus.select(
        F.col(id_col).alias("id"), quantized_col(emb_col).alias("e")
    ).withColumn("bucket", lsh_bucket_col(F.col("e"), weights))
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


# ----------------------------------------------------------------- IVF ANN
def int_l2sq(a: F.Column, b: F.Column) -> F.Column:
    """Exact squared L2 distance between two quantized (int64) vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _centroid_codebook(corpus: DataFrame, id_col: str, emb_col: str, n_centroids: int):
    """The IVF codebook as a ONE-ROW DataFrame: the ``n_centroids``
    corpus rows with the smallest ids, collected into a cid-sorted array of
    (cid, ce) structs. Deterministic (id order), data-driven (real corpus
    vectors, unlike the random-hyperplane LSH path), and tiny —
    n_centroids × dim int64s, e.g. 256 × 1024 = 2 MB at real embedding
    widths — so it broadcasts as plan-side state exactly like a trained
    IVF codebook would on a production cluster (where it comes from a
    separate k-means job over a sample; centroid *selection* is pluggable,
    everything downstream only needs the (cid, ce) array)."""
    cents = (
        corpus.select(F.col(id_col).alias("cid"), quantized_col(emb_col).alias("ce"))
        .orderBy("cid")
        .limit(n_centroids)
    )
    return cents.agg(F.array_sort(F.collect_list(F.struct("cid", "ce"))).alias("cents"))


def _nearest_cells(e: F.Column, cents: F.Column, n_probe: int) -> F.Column:
    """ids of the ``n_probe`` nearest centroids to quantized vector ``e``,
    as a pure Column expression over the broadcast codebook array: compute
    (dist, cid) per centroid, array_sort (lexicographic struct order ==
    dist asc, cid asc — ties deterministic), slice, project cid. Zero
    exchanges — assignment is a projection, the IVF analogue of
    ``lsh_bucket_col``."""
    ranked = F.array_sort(
        F.transform(cents, lambda c: F.struct(int_l2sq(e, c["ce"]).alias("d"), c["cid"].alias("cid")))
    )
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s["cid"])


def ivf_assign(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, cell, e): each corpus row assigned to its single nearest
    centroid (n_probe=1). The codebook joins in as a broadcast one-row
    cross join, so the assignment adds NO exchange over the corpus."""
    return (
        corpus.select(F.col(id_col).alias("id"), quantized_col(emb_col).alias("e"))
        .crossJoin(F.broadcast(codebook))
        .select("id", "e", F.element_at(_nearest_cells(F.col("e"), F.col("cents"), 1), 1).alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    spark,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the second scale path for
    similarity search, complementing ``lsh_ann_topk``.

    Plan shape (the 100 TB-critical part):
      1. codebook: n_centroids smallest-id corpus vectors → one-row array
         (a LIMIT job over a tiny prefix — the only extra action).
      2. corpus assignment: broadcast cross join + argmin projection —
         ZERO corpus exchanges; each vector lands in exactly one cell.
      3. queries probe their ``n_probe`` nearest cells (explode of an
         n_probe-element array on the tiny query side only).
      4. candidate join on cell with the QUERY side broadcast; exact
         quantized-int dot scores; per-query window top-k.
    Corpus-side cost is one scan + one hash exchange (the cell join), and
    candidates per query shrink by ~n_probe/n_centroids — the classic IVF
    recall/cost dial. A corpus row is in exactly one cell, so
    (query, neighbor) pairs are already distinct — no dedup needed.

    All math is exact int64 over floor-quantized vectors with deterministic
    cid tie-breaks, so the result has an exact DuckDB oracle
    (oracles.py ``ann_ivf_topk``). Recall vs ``brute_force_topk`` is
    measured in tests/test_similarity_ivf.py."""
    from pyspark.sql import Window as W

    codebook = _centroid_codebook(corpus, id_col, emb_col, n_centroids)
    c = ivf_assign(corpus, codebook, id_col, emb_col).select(
        F.col("id").alias("neighbor_id"), F.col("e").alias("c_emb"), "cell"
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), quantized_col(emb_col).alias("q_emb"))
        .crossJoin(F.broadcast(codebook))
        .select(
            "query_id",
            "q_emb",
            F.explode(_nearest_cells(F.col("q_emb"), F.col("cents"), n_probe)).alias("cell"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", int_dot(F.col("q_emb"), F.col("c_emb")).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )
