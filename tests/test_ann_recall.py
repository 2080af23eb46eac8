"""ANN recall metrology (round-5 ask): an ANN index's fitness number is
recall@k against the exact brute-force baseline on the same data, so the
IVF and LSH paths each pin a measured recall FLOOR on a seeded clustered
corpus — plus the k-means codebook's two fitness numbers (quantization
objective, search recall) against the first-k pick on the worst case for
first-k (all seed keys drawn from one cluster).

Corpus construction: 8 clusters in 16 dims, deterministic integer-hash
centers and jitter, overlapping enough that top-10 neighbor sets straddle
cells (measured: IVF n_probe=1 recall 0.965, not 1.0 — the probe dial is
live). Random-uniform embeddings (the sf tables) are the worst case for
ANY partition-based ANN and carry no SLA; clustered data is what ANN
indexes exist for, and is where a floor is meaningful.

Measured values pinned below (floors leave margin, seeds are fixed):
  IVF   n_probe 1/2/3 recall@10 = 0.965 / 0.995 / 1.0
  LSH   planes  4/6   recall@10 = 0.85  / 0.755  (more planes -> smaller
        buckets -> fewer candidates: the LSH recall/cost dial runs the
        OPPOSITE direction from IVF's n_probe)
  codebook (blocked ids, n_probe=2): first_k recall 0.51, kmeans 1.0;
        quantization objective 8.0e12 vs 2.1e12 (3.8x better).
"""

from __future__ import annotations

from omop_meds_spark.operators import similarity as SIM
from omop_meds_spark.operators.vector_index import (
    IVFIndexView,
    _l2sq_py,
    _quantize_py,
    kmeans_codebook,
)
from omop_meds_spark.table import SnapshotTable

DIM, K, PER = 16, 8, 25
N = K * PER


def _center(c):
    return [((c * 37 + j * 17) % 23 - 11) * 0.55 for j in range(DIM)]


def _jit(i, j):
    return ((i * 101 + j * 13) % 13 - 6) * 0.45


def _vec(i, cluster):
    return [_center(cluster)[j] + _jit(i, j) for j in range(DIM)]


def _interleaved(spark):
    """id % 8 = cluster: the 8 smallest ids cover all clusters (a fair
    first-k codebook — isolates the probe dial from codebook quality)."""
    rows = [(i, _vec(i, i % K)) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_recall_floors_and_probe_dial(spark):
    emb = _interleaved(spark)
    queries = emb.filter("vec_id < 20")
    exact = _pairs(SIM.brute_force_topk(emb, queries, k=10))

    def recall(n_probe):
        got = _pairs(SIM.ivf_topk(emb, queries, spark, k=10,
                                  n_centroids=8, n_probe=n_probe))
        return len(exact & got) / len(exact)

    r1, r2, r3 = recall(1), recall(2), recall(3)
    assert r1 >= 0.9  # measured 0.965
    assert r1 <= r2 <= r3
    assert r3 >= 0.95  # measured 1.0


def test_lsh_recall_floors(spark):
    emb = _interleaved(spark)
    queries = emb.filter("vec_id < 20")
    exact = _pairs(SIM.brute_force_topk(emb, queries, k=10))

    def recall(n_planes):
        got = _pairs(SIM.lsh_ann_topk(emb, queries, spark, k=10,
                                      n_planes=n_planes, dim=DIM))
        return len(exact & got) / len(exact)

    assert recall(4) >= 0.8   # measured 0.85
    assert recall(6) >= 0.7   # measured 0.755


def _blocked_source(spark, root):
    """id // 25 = cluster: the 8 smallest keys ALL sit in cluster 0 — the
    degenerate case for the first-k pick (every centroid in one cluster)."""
    rows = [(f"{i:04d}", _vec(i, i // PER), i, "U") for i in range(N)]
    df = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, seq_no long, op string")
    tbl = SnapshotTable(root, ["vec_id"], n_buckets=4)
    tbl.commit_delta_auto(df, 0)
    return tbl


def _objective(idx, qz):
    """The k-means objective: sum over the corpus of l2sq to the nearest
    centroid — lower = tighter cells = fewer cross-cell neighbor misses."""
    cents = idx.codebook()
    return sum(min(_l2sq_py(e, c) for c in cents) for e in qz.values())


def test_kmeans_codebook_beats_first_k(spark, tmpdir_path):
    qz = {f"{i:04d}": _quantize_py(_vec(i, i // PER)) for i in range(N)}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    queries = [f"{i:04d}" for i in range(0, N, 20)]  # 10, spread over clusters
    exact = {
        q: set(sorted((k for k in qz if k != q),
                      key=lambda k, q=q: (-dot(qz[q], qz[k]), k))[:10])
        for q in queries
    }

    stats = {}
    for method in ("first_k", "kmeans"):
        tbl = _blocked_source(spark, f"{tmpdir_path}/src_{method}")
        idx = IVFIndexView(f"{tmpdir_path}/idx_{method}", tbl,
                           n_centroids=8)
        idx.build(spark, method=method)
        idx.refresh(spark)
        hits = 0
        for q in queries:
            got = {r["vec_id"]
                   for r in idx.search(spark, _vec(int(q), int(q) // PER),
                                       k=11, n_probe=2).collect()
                   if r["vec_id"] != q}
            hits += len(exact[q] & got)
        stats[method] = (_objective(idx, qz), hits / (10 * len(queries)))

    (fk_cost, fk_recall), (km_cost, km_recall) = stats["first_k"], stats["kmeans"]
    # measured: cost 8.0e12 -> 2.1e12, recall 0.51 -> 1.0
    assert km_cost * 2 < fk_cost
    assert km_recall >= 0.9
    assert km_recall >= fk_recall + 0.2


def test_kmeans_matches_pure_python_model(spark):
    """Determinism pin independent of the DuckDB oracle: the Spark job and
    a pure-Python Lloyd twin (same seeds, same argmin tie order, same
    floor-integer mean) produce the identical codebook."""
    emb = _interleaved(spark).filter("vec_id < 60")
    got = kmeans_codebook(spark, emb, ["vec_id"], "embedding", k=4, iters=2)

    qz = {i: _quantize_py(_vec(i, i % K)) for i in range(60)}
    cents = [list(qz[i]) for i in range(4)]  # first-k seeds, key order
    for _ in range(2):
        members = {c: [] for c in range(4)}
        for i, e in qz.items():
            cell = min(range(4), key=lambda c: (_l2sq_py(e, cents[c]), c))
            members[cell].append(e)
        cents = [
            [sum(col) // len(ms) for col in zip(*ms)] if ms else cents[c]
            for c, ms in members.items()
        ]
    assert got == cents


def test_rebuild_preserves_codebook_method(spark, tmpdir_path):
    tbl = _blocked_source(spark, f"{tmpdir_path}/src")
    idx = IVFIndexView(f"{tmpdir_path}/idx", tbl, n_centroids=4)
    idx.build(spark, method="kmeans")
    idx.refresh(spark)
    before = idx.codebook()
    idx.rebuild(spark)
    import json

    meta = json.loads(idx._codebook_path.read_text())
    assert meta["method"] == "kmeans"
    assert idx.codebook() == before  # same corpus, same deterministic job
