"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed as DataFrame ops over JVM-side functions (no
Python in the hot path), each designed so an exact DuckDB oracle exists:

* **exact** — hash-groupBy on a normalized fingerprint; keeps the lowest id
  per group (deterministic canonical representative).
* **MinHash + LSH** — word-shingle → k minhashes → b bands → bucket join.
  The hash is the cross-engine ``md5_long`` (first 15 hex chars of md5 as
  int64), so signatures are bit-identical in DuckDB.
* **SimHash** — 16-bit sign-aggregated token-hash fingerprint (Column
  algebra: one token-hash array + 16 cheap aggregates).
* **n-gram Jaccard** — exact similarity on candidate pairs (from LSH bands
  or a blocking key): |intersect| / |union| of distinct token sets.

Scale notes: exact dedup is one shuffle on the fingerprint. MinHash LSH is
a map-side signature projection + explode(bands) + self-equi-join on
(band, hash) — the join key is the bucket, so only colliding docs shuffle
together; at 100 TB you'd additionally salt giant buckets (boilerplate
clusters) and cap bucket size; the bucket-size cap is exposed as a knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ALNUM_TOKEN_RX, fingerprint, md5_long

#: degenerate-LSH-bucket cap: a band bucket larger than this is a
#: pathological all-identical cluster. Shared by the Spark operators AND
#: the DuckDB oracles (oracles.py interpolates this constant) so the cap
#: can never silently drift between engine and parity check.
DEFAULT_MAX_BUCKET = 1000

DEFAULT_K = 8  # minhashes
DEFAULT_BANDS = 4  # LSH bands (k/b rows per band)
SHINGLE_N = 3


def tokens_col(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(ALNUM_TOKEN_RX), F.lit(1))


def distinct_tokens_col(col) -> F.Column:
    return F.array_distinct(tokens_col(col))


# --------------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per normalized-content fingerprint; lowest id survives.
    Returns (fingerprint, keep_id, n_dups)."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


# ------------------------------------------------------------------- minhash
def shingles_col(col, n: int = SHINGLE_N) -> F.Column:
    """Word n-gram shingles; documents shorter than n words shingle to the
    full token join (so nothing hashes to an empty set)."""
    toks = tokens_col(col)
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, ngrams).otherwise(F.array(F.concat_ws(" ", toks)))


#: universal-hash family for the k minhash functions: ONE md5 base hash
#: per shingle, then h_j = A[j] * ((h XOR R[j]) mod M31) + B[j] — 8x fewer
#: md5 evaluations (md5 is the dominant cost of the whole LSH pipeline).
#: The XOR with a per-j 60-bit constant comes FIRST: it re-permutes which
#: shingle attains the minimum for each j (a bijection that reorders
#: values), and the mod-M31 fold then mixes high bits into the compared
#: range. Without the XOR, every h_j would be monotone in the same base
#: value (the affine product never exceeds 2^62, so a mod-2^61 wrap never
#: fires) and all k minima would pick the SAME shingle — measured: LSH
#: candidate pairs exploded 12x. Constants are fixed primes / digit runs;
#: the DuckDB oracles interpolate the same values, so cross-engine parity
#: is exact.
_MH_M31 = 2147483647            # 2^31 - 1
MH_A = [1000000007, 998244353, 754974721, 167772161,
        469762049, 1004535809, 1107296257, 897581057]
MH_B = [12289, 40961, 65537, 114689, 147457, 163841, 557057, 786433]
MH_R = [0x0F1E2D3C4B5A6978, 0x0123456789ABCDE, 0x0DEADBEEFCAFE42,
        0x0ABCDEF98765432, 0x0192A3B4C5D6E7F, 0x0F0E1D2C3B4A596,
        0x01B2C3D4E5F6A78, 0x0C0FFEE123456AB]


def _mh_affine(j: int, base: F.Column) -> F.Column:
    """h_j from the base hash — ``A[j] * ((base ^ R[j]) mod (2^31-1))``
    fits in 62 bits, so the arithmetic is ANSI-overflow-safe in Spark and
    DuckDB alike."""
    return (F.lit(MH_A[j]) * F.pmod(base.bitwiseXOR(F.lit(MH_R[j])), F.lit(_MH_M31))
            + F.lit(MH_B[j]))


def minhash_signature(col, k: int = DEFAULT_K, n: int = SHINGLE_N) -> F.Column:
    """Array of k minhashes (affine family over one md5 base hash per
    shingle — see ``MH_A``)."""
    base = F.transform(shingles_col(col, n), lambda s: md5_long(s))

    def mh(j: int) -> F.Column:
        # single-arg lambda: a 2-arg lambda would receive the array index
        # as its second argument (pyspark transform semantics)
        return F.array_min(F.transform(base, lambda h: _mh_affine(j, h)))

    return F.array(*[mh(j) for j in range(k)])


def minhash_signatures_df(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K, n: int = SHINGLE_N
) -> DataFrame:
    """Per-document minhash signature as columns (id, mh_0..mh_{k-1}).

    Shape matters at scale: explode shingles once (the regex tokenization
    runs ONCE per document), hash each shingle under k seeds in one narrow
    projection, then one groupBy(id) with k ``min`` aggregates — map-side
    partial combine means the shuffle carries k longs per document, and the
    resulting exchange is reused by every downstream consumer (bucket
    counts + both sides of the LSH self-join) instead of recomputing the
    whole hash pipeline per consumer.
    """
    sh = df.select(F.col(id_col).alias("id"), F.explode(shingles_col(text_col, n)).alias("s"))
    # ONE md5 per shingle; the k hash functions are affine derivations of it
    based = sh.select("id", md5_long(F.col("s")).alias("h"))
    hashed = based.select(
        "id", *[_mh_affine(j, F.col("h")).alias(f"h{j}") for j in range(k)]
    )
    return hashed.groupBy("id").agg(*[F.min(f"h{j}").alias(f"mh_{j}") for j in range(k)])


def banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(id, band, bh) LSH postings: each document's signature split into
    ``bands`` row-groups, each hashed to one bucket key. One narrow
    projection over ``minhash_signatures_df`` + an explode to ``bands``
    rows per document — the banding itself is shuffle-free."""
    rows_per_band = k // bands
    sig = minhash_signatures_df(df, id_col, text_col, k)
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        md5_long(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"mh_{b * rows_per_band + r}").cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) whose signatures collide in at
    least one LSH band. ``max_bucket`` drops degenerate buckets (e.g. empty
    documents) that would explode quadratically at scale."""
    banded = banded_signatures(df, id_col, text_col, k, bands)
    # Pair generation WITHOUT a self-join: group each band bucket into an
    # id array (one shuffle on the bucket key), drop degenerate buckets by
    # array size, then emit the a<b pairs by exploding TWICE — once to one
    # row per (bucket, id_a), once more over that row's value-greater
    # suffix. The old self-join shape (and its counts+semi cap) made four
    # non-identical subtrees, each recomputing the whole signature
    # pipeline (explode + md5 + agg) — plan-asserted single-subtree now.
    # Memory: the two-step explode keeps the largest single array value at
    # O(max_bucket) elements (the bucket's own id list / one suffix),
    # NEVER the flattened O(max_bucket^2) pair array of the earlier shape
    # — raising the cap to 10k costs ~80 KB per row, not ~1.6 GB.
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") <= max_bucket)
        .filter(F.size("ids") >= 2)
    )
    lhs = buckets.select("ids", F.explode("ids").alias("id_a"))
    return (
        lhs.select(
            "id_a",
            F.explode(F.filter(F.col("ids"), lambda y: y > F.col("id_a"))).alias("id_b"),
        )
        .distinct()
    )


def minhash_lsh_probe(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """INCREMENTAL near-dup candidates: an arriving batch probes the
    corpus' LSH bucket index instead of re-pairing the whole corpus.

    This is the dedup shape a CDC-fed training-data pipeline actually runs
    per micro-batch: the corpus' (band, bh) → [ids] bucket index is built
    ONCE (and at 100 TB persisted/maintained as a bucketed table — exactly
    the ``buckets`` relation below), so each batch costs only (a) hashing
    the batch's own documents (O(batch), the same signature projection as
    the full pass) and (b) one equi-join of the batch's ``bands`` postings
    per doc against the index. A CDC micro-batch is tiny next to the
    corpus, so Spark broadcasts the probe side — the corpus index is
    never reshuffled, and AQE never sees an all-pairs shape. Degenerate
    corpus buckets (> ``max_bucket`` members, boilerplate clusters) are
    dropped by the same dial as :func:`minhash_lsh_pairs`.

    Returns distinct ``(new_id, corpus_id)`` candidates, self-matches
    excluded (an update's own prior version shares every band).
    """
    probe = banded_signatures(new_docs, id_col, text_col, k, bands)
    index = (
        banded_signatures(corpus, id_col, text_col, k, bands)
        .groupBy("band", "bh")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") <= max_bucket)
    )
    hits = F.broadcast(probe.withColumnRenamed("id", "new_id")).join(
        index, ["band", "bh"]
    )
    return (
        hits.select(
            "new_id",
            F.explode(F.filter(F.col("ids"), lambda y: y != F.col("new_id"))).alias(
                "corpus_id"
            ),
        )
        .distinct()
    )


# ------------------------------------------------------------------- simhash
SIMHASH_BITS = 16


def simhash_col(col, bits: int = SIMHASH_BITS) -> F.Column:
    """Sign-aggregated token-hash fingerprint: bit b is set iff the sum of
    (+1/-1 per token by bit b of its hash) is positive."""
    hashes = F.transform(F.array_distinct(tokens_col(col)), md5_long)

    def bit_contrib(b: int) -> F.Column:
        def signed(h: F.Column) -> F.Column:
            return F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            )

        return F.aggregate(F.transform(hashes, signed), F.lit(0), lambda acc, x: acc + x)

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(bit_contrib(b) > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Documents sharing an identical simhash (strong near-dup signal at 16
    bits only for very similar docs). Returns (simhash, n_docs, doc_ids)."""
    return (
        df.select(F.col(id_col).alias("id"), simhash_col(text_col).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list("id")).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


# ------------------------------------------------------------------- jaccard
def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over pairs sharing a blocking key.
    Returns (id_a, id_b, jaccard) above threshold.

    SCALE WARNING: the within-block self-join is quadratic in block size.
    Only use with a high-cardinality blocking key whose block sizes stay
    bounded as data grows; for corpus-wide near-dup detection use
    :func:`jaccard_pairs_lsh`, whose candidate set comes from the banded
    MinHash join (bucketed + capped, not all-pairs)."""
    t = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        distinct_tokens_col(text_col).alias("toks"),
    ).repartition(F.col("blk"))
    # the repartition exchange co-partitions the self-join on blk AND is
    # reused by both join sides (ReuseExchange) — the regex tokenization
    # runs once per document instead of once per side
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("a.blk") == F.col("b.blk"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_on_candidates(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard scored only on the given candidate pairs
    (columns id_a < id_b). Two keyed equi-join shuffles, linear in
    |candidates| + |corpus| — no quadratic block anywhere."""
    t = df.select(F.col(id_col).alias("id"), distinct_tokens_col(text_col).alias("toks"))
    a = t.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = t.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.array_union(F.col("toks_a"), F.col("toks_b")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Corpus-wide exact-Jaccard near-dup pairs, candidate-generated by the
    banded MinHash LSH join (the scale-safe composition: LSH recall gate →
    exact verify). Replaces low-cardinality blocking keys, whose blocks grow
    linearly with data and whose self-join is quadratic within a block."""
    cand = minhash_lsh_pairs(df, id_col, text_col, k=k, bands=bands, max_bucket=max_bucket)
    return jaccard_on_candidates(df, cand, id_col, text_col, threshold)


def connected_components(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "vec_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster the near-dup pair graph: connected components by iterative
    MIN-LABEL propagation — the final dedup-pipeline stage (pairs →
    clusters → pick one canonical doc per cluster, here min id).

    Returns (doc_id, cluster_id) for EVERY id in ``ids`` (singletons are
    their own cluster), cluster_id = the component's minimum id — the
    same deterministic labeling a recursive-CTE closure produces, so an
    exact SQL oracle exists.

    Iterative by nature (this is GraphX/HashToMin territory, not a single
    Catalyst plan): each round joins labels to the symmetric edge list,
    takes the min over (own label, neighbors' labels), and stops when the
    label-sum fixpoint is reached (labels only ever decrease, so the sum
    is a monotone convergence witness — one cheap agg action per round,
    no row-level diff join). Rounds needed = component diameter; near-dup
    clusters are dense (diameter 2-4 in practice), and each round is two
    keyed shuffles over O(edges + ids) — at 100 TB this runs like any
    iterative Spark graph job: persist each generation, unpersist the
    last, label frame never wider than (id, label).
    """
    edges = (pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
             .unionByName(pairs.select(F.col(b_col).alias("a"),
                                       F.col(a_col).alias("b")))
             .persist())
    labels = ids.select(F.col(id_col).alias("doc_id"),
                        F.col(id_col).alias("cluster_id")).persist()
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    try:
        for _ in range(max_iter):
            nbr = (edges.join(labels, edges["a"] == labels["doc_id"])
                   .groupBy(F.col("b").alias("doc_id"))
                   .agg(F.min("cluster_id").alias("_nbr_min")))
            nxt = (labels.join(nbr, "doc_id", "left")
                   .select("doc_id",
                           F.least(F.col("cluster_id"),
                                   F.coalesce(F.col("_nbr_min"),
                                              F.col("cluster_id")))
                           .alias("cluster_id"))
                   .persist())
            new_sum = nxt.agg(F.sum("cluster_id")).collect()[0][0]
            labels.unpersist()
            labels = nxt
            if new_sum == prev_sum:  # fixpoint: no label decreased
                break
            prev_sum = new_sum
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_iter} rounds "
                "(component diameter exceeds max_iter — raise it)")
        # Detach the result from the persisted generation FOR REAL:
        # localCheckpoint materializes the small (id, label) frame, cuts
        # the iterative lineage, and its blocks are ContextCleaner-managed
        # (freed when the frame is GC'd) — returning the persisted frame
        # directly would pin the last generation's cache for the session.
        # (Executor loss invalidates localCheckpoint blocks; callers
        # needing fault-tolerant recompute should write the result out.)
        out = labels.localCheckpoint(eager=True)
        labels.unpersist()
        return out.select("doc_id", "cluster_id")
    finally:
        edges.unpersist()
