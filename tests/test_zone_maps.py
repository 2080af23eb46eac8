"""Zone maps (per-file column bounds in the manifest) and stats-pruned
scans: Iceberg-style file skipping on the snapshot table.

Correctness contract under merge-on-read: ``read_live(between=...)``
evaluates the predicate against the LWW WINNER row, so file skipping is
applied only where it cannot change the winner (single-generation
buckets); multi-generation buckets scan every generation and filter after
the reduce.
"""

from __future__ import annotations

import datetime as dt

from omop_meds_spark.table import (
    BUCKET_COL,
    SnapshotTable,
    bucket_expr,
    _stat_json,
    _stats_overlap,
)

KEYS = ["repo", "path"]
SCHEMA = "repo string, path string, seq_no long, ts long, op string"


def _delta(spark, rows, n_buckets=4, schema=SCHEMA):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn(BUCKET_COL, bucket_expr(KEYS, n_buckets))


def _touched(df):
    return sorted({r[BUCKET_COL] for r in df.select(BUCKET_COL).distinct().collect()})


def _rows(df, cols=("repo", "path", "seq_no", "ts")):
    if df is None:
        return set()
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_zone_map_prunes_files_on_read(spark, tmpdir_path):
    """Three batches with disjoint ts ranges; a ranged read opens only the
    matching batch's files and returns exactly the full-scan-filtered rows."""
    t = SnapshotTable(tmpdir_path, KEYS, n_buckets=4, stats_cols=["ts"])
    for i in range(3):
        rows = [(f"r{i}{j}", "p", i * 10 + j, i * 100 + j * 10, "U")
                for j in range(4)]
        d = _delta(spark, rows)
        assert t.commit_delta(d, i, _touched(d), i * 10 + 3)

    pruned = t.read(spark, between=("ts", 100, 199))
    files = pruned.inputFiles()
    assert files, "pruned read returned no files"
    assert all("b000001" in f for f in files), files  # only batch 1's files
    full = t.read(spark).filter("ts >= 100 and ts <= 199")
    assert _rows(pruned) == _rows(full)
    assert len(files) < len(t.read(spark).inputFiles())


def test_read_live_between_is_winner_semantics_on_multi_gen(spark, tmpdir_path):
    """The poison case for naive file skipping: key k's WINNER (ts=100) is
    outside the range but a stale loser (ts=10) is inside. k must NOT
    surface, and the multi-generation bucket must not be file-pruned."""
    t = SnapshotTable(tmpdir_path, KEYS, n_buckets=2, stats_cols=["ts"])
    d0 = _delta(spark, [("k", "p", 1, 10, "U"), ("j", "p", 2, 20, "U")],
                n_buckets=2)
    t.commit_delta(d0, 0, _touched(d0), 2)
    d1 = _delta(spark, [("k", "p", 3, 100, "U")], n_buckets=2)
    t.commit_delta(d1, 1, _touched(d1), 3)

    got = _rows(t.read_live(spark, between=("ts", 0, 50)))
    naive = _rows(t.read_live(spark).filter("ts >= 0 and ts <= 50"))
    assert got == naive
    assert ("j", "p", 2, 20) in got
    assert not any(r[0] == "k" for r in got)


def test_read_live_between_prunes_compacted_buckets(spark, tmpdir_path):
    """After compaction every bucket is single-generation, so the ranged
    live read skips whole buckets by their recorded bounds."""
    t = SnapshotTable(tmpdir_path, KEYS, n_buckets=4, stats_cols=["ts"])
    d0 = _delta(spark, [("a", "p", 1, 10, "U"), ("b", "p", 2, 1000, "U")])
    t.commit_delta(d0, 0, _touched(d0), 2)
    d1 = _delta(spark, [("a", "p", 3, 20, "U"), ("b", "p", 4, 2000, "U")])
    t.commit_delta(d1, 1, _touched(d1), 4)
    ba, bb = _touched(_delta(spark, [("a", "p", 0, 0, "U")]))[0], \
        _touched(_delta(spark, [("b", "p", 0, 0, "U")]))[0]
    assert ba != bb, "fixture needs the two keys in distinct buckets"
    assert t.compact(spark)

    live = t.read_live(spark, between=("ts", 0, 100))
    assert _rows(live) == {("a", "p", 3, 20)}
    files = live.inputFiles()
    assert len(files) == 1, files  # b's bucket file skipped entirely


def test_stats_survive_checkpoint_vacuum_and_reopen(spark, tmpdir_path):
    """Zone maps are table state: they ride checkpoints, are pruned to the
    live file set by compaction/vacuum, and a fresh process sees them."""
    t = SnapshotTable(tmpdir_path, KEYS, n_buckets=4, checkpoint_every=2,
                      stats_cols=["ts"])
    for i in range(5):
        d = _delta(spark, [(f"k{i}", "p", i, i * 100, "U")])
        t.commit_delta(d, i, _touched(d), i)
    assert t.compact(spark)
    t.vacuum(keep_versions=2)
    t.release_writer()

    t2 = SnapshotTable(tmpdir_path, KEYS)  # stats_cols adopted from _table.json
    assert t2.stats_cols == ["ts"]
    m = t2.latest()
    live = {f for fs in m["files"].values() for f in fs}
    assert set(m["file_stats"]) == live  # exactly the live files, no strays
    got = _rows(t2.read(spark, between=("ts", 200, 300)))
    assert got == {("k2", "p", 2, 200), ("k3", "p", 3, 300)}


def test_datetime_zone_maps(spark, tmpdir_path):
    """Timestamp columns encode to ISO strings (order-preserving), so
    datetime bounds prune files and the row filter matches exactly."""
    t = SnapshotTable(tmpdir_path, KEYS, n_buckets=4, stats_cols=["at"])
    schema = "repo string, path string, seq_no long, at timestamp, op string"
    base = dt.datetime(2024, 1, 1)
    for i in range(3):
        rows = [(f"r{i}{j}", "p", i * 10 + j,
                 base + dt.timedelta(days=30 * i, hours=j), "U")
                for j in range(3)]
        d = _delta(spark, rows, schema=schema)
        t.commit_delta(d, i, _touched(d), i * 10 + 2)

    lo, hi = base + dt.timedelta(days=29), base + dt.timedelta(days=32)
    pruned = t.read(spark, between=("at", lo, hi))
    assert all("b000001" in f for f in pruned.inputFiles())
    assert {r["repo"] for r in pruned.collect()} == {"r10", "r11", "r12"}


def test_clustered_compaction_sorts_rows_for_row_group_pruning(spark, tmpdir_path):
    """compact(cluster_by=...) must physically order each bucket file by
    the cluster columns — that ordering is what makes parquet row-group
    min/max bounds non-overlapping, so pushed-down range filters skip row
    groups inside the file. Live rows are unchanged."""
    import pyarrow.parquet as pq

    t = SnapshotTable(tmpdir_path, KEYS, n_buckets=2, stats_cols=["ts"])
    rng_rows = [(f"k{i}", "p", i, (i * 7919) % 1000, "U") for i in range(300)]
    for half, bid in ((rng_rows[:150], 0), (rng_rows[150:], 1)):
        d = _delta(spark, half, n_buckets=2)
        t.commit_delta(d, bid, _touched(d), max(r[2] for r in half))
    before = _rows(t.read_live(spark))

    assert t.compact(spark, cluster_by=["ts"])
    assert _rows(t.read_live(spark)) == before
    m = t.latest()
    for fs in m["files"].values():
        assert len(fs) == 1  # one-file-per-bucket invariant intact
        tbl = pq.read_table(str(t.root / fs[0]), columns=["ts"])
        ts = tbl.column("ts").to_pylist()
        assert ts == sorted(ts), "bucket file not clustered by ts"
        md = pq.ParquetFile(str(t.root / fs[0])).metadata
        if md.num_row_groups > 1:  # bounds must then be non-overlapping
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}["ts"]
            bounds = [(md.row_group(g).column(idx).statistics.min,
                       md.row_group(g).column(idx).statistics.max)
                      for g in range(md.num_row_groups)]
            assert all(bounds[g][1] <= bounds[g + 1][0]
                       for g in range(len(bounds) - 1))


def test_stat_helpers_edge_cases():
    assert _stat_json(True) is None  # booleans record no zone map
    assert _stats_overlap([5, 5], 5, 5)
    assert not _stats_overlap([5, 5], 6, None)
    assert _stats_overlap({}, 0, 1)  # no stats recorded: never prune


def test_zorder_compaction_bounds_every_dimension(spark, tmpdir_path):
    """Z-order vs lexicographic clustering over two INDEPENDENT uniform
    columns: slicing the compacted file into contiguous chunks (what
    parquet row groups are at scale), lexicographic order leaves the
    SECOND column's per-chunk span at ~the full range, while the Morton
    order bounds both dimensions — the property row-group pruning needs
    on multi-column ranged reads. Also: identical row SET either way."""
    import pyarrow.parquet as pq

    from omop_meds_spark.table import SnapshotTable, bucket_expr, BUCKET_COL

    rows = [("k%04d" % i, "p", i,
             (i * 48271) % 9973,          # dim a: uniform, independent of b
             (i * 69621) % 9973, "U")     # dim b: uniform, independent of a
            for i in range(4000)]
    schema = "repo string, path string, seq_no long, a long, b long, op string"

    def spans(root_dir, mode):
        t = SnapshotTable(f"{root_dir}/{mode}", ["repo", "path"], n_buckets=1)
        df = spark.createDataFrame(rows, schema).withColumn(
            BUCKET_COL, bucket_expr(["repo", "path"], 1))
        t.commit_delta_auto(df, 0)
        assert t.compact(spark, cluster_by=["a", "b"], cluster_mode=mode)
        fs = [f for fs_ in t.latest()["files"].values() for f in fs_]
        tbl = pq.read_table(str(t.root / fs[0]), columns=["a", "b"]).to_pandas()
        n, k = len(tbl), 8
        out = {}
        for c in ("a", "b"):
            chunk_spans = [tbl[c][i * n // k:(i + 1) * n // k].agg(["min", "max"])
                           for i in range(k)]
            out[c] = sum(mx - mn for mn, mx in chunk_spans) / k
        return out, {(r.a, r.b) for r in tbl.itertuples()}

    lex, rows_lex = spans(tmpdir_path, "lex")
    zed, rows_z = spans(tmpdir_path, "zorder")
    full = 9973
    assert lex["a"] < 0.25 * full          # leading column: both modes tight
    assert zed["a"] < 0.6 * full
    assert lex["b"] > 0.8 * full           # lex leaves b unclustered…
    assert zed["b"] < 0.6 * full           # …z-order bounds it too
    assert rows_lex == rows_z              # clustering never changes content
