"""IVF ANN: correctness vs the DuckDB oracle at sf0.001, recall vs the
exact brute-force baseline, and the recall/cost dial (more probes -> more
recall, full probe == exact)."""

from __future__ import annotations

import duckdb
import pytest

from omop_meds_spark.operators import similarity as SIM
from omop_meds_spark.queries import ALL_QUERIES, t
from omop_meds_spark.oracles import ORACLES

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_topk_matches_duckdb_oracle(spark):
    got = _rows(ALL_QUERIES["ann_ivf_topk"](spark, SF))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = sorted(tuple(r) for r in con.sql(ORACLES["ann_ivf_topk"]).fetchall())
    assert got == want


def test_ivf_recall_vs_brute_force(spark):
    """With 8 cells and 2 probes the candidate set is ~25% of the corpus;
    random-ish embeddings are a worst case for any partition-based ANN, so
    the bar here is structural sanity (well-formed top-k, nonzero overlap
    with the exact answer), not a recall SLA."""
    emb = t(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = _rows(SIM.brute_force_topk(emb, queries, k=5))
    approx = _rows(SIM.ivf_topk(emb, queries, spark, k=5, n_centroids=8, n_probe=2))
    exact_pairs = {(q, n) for q, _, n, _ in exact}
    approx_pairs = {(q, n) for q, _, n, _ in approx}
    assert len(approx_pairs) == 50  # 10 queries x full k=5 (cells are large)
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall > 0.0


def test_ivf_full_probe_equals_brute_force(spark):
    """n_probe == n_centroids degrades IVF to exact search: every cell is
    probed, so the ranking must equal the brute-force baseline exactly."""
    emb = t(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = _rows(SIM.brute_force_topk(emb, queries, k=5))
    full = _rows(SIM.ivf_topk(emb, queries, spark, k=5, n_centroids=8, n_probe=8))
    assert full == exact


def test_ivf_monotone_recall_in_probes(spark):
    emb = t(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact_pairs = {
        (q, n) for q, _, n, _ in _rows(SIM.brute_force_topk(emb, queries, k=5))
    }

    def recall(n_probe):
        pairs = {
            (q, n)
            for q, _, n, _ in _rows(
                SIM.ivf_topk(emb, queries, spark, k=5, n_centroids=8, n_probe=n_probe)
            )
        }
        return len(exact_pairs & pairs) / len(exact_pairs)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8 == 1.0


def test_connected_components_chain_and_singletons(spark):
    """Transitivity across a chain (a-b, b-c, c-d => one cluster), an
    independent pair, and untouched singletons — all labeled by component
    min; fixpoint detection terminates on the sum witness."""
    from omop_meds_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]],
                                "vec_id long")
    out = {(r["doc_id"], r["cluster_id"])
           for r in connected_components(pairs, ids).collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (99, 99)}
