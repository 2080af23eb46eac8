"""Snapshot-log table: atomic commit, exactly-once idempotence, pruned reads."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from omop_meds_spark.table import BUCKET_COL, SnapshotTable, bucket_expr


def _df(spark, rows):
    df = spark.createDataFrame(rows, "repo string, path string, seq_no long, op string")
    return df.withColumn(BUCKET_COL, bucket_expr(["repo", "path"], 4))


def test_commit_and_read(spark, tmpdir_path):
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    df = _df(spark, [("r1", "p1", 1, "U"), ("r2", "p2", 2, "U")])
    touched = sorted({r[BUCKET_COL] for r in df.select(BUCKET_COL).collect()})
    assert t.commit_merged(df, batch_id=0, touched_buckets=touched, watermark_seq=2)
    assert t.version == 0
    assert t.watermark() == 2
    got = {(r["repo"], r["path"]) for r in t.read_live(spark).collect()}
    assert got == {("r1", "p1"), ("r2", "p2")}


def test_idempotent_recommit(spark, tmpdir_path):
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    df = _df(spark, [("r1", "p1", 1, "U")])
    assert t.commit_merged(df, 0, [0, 1, 2, 3], 1)
    # replaying the same batch is a no-op — no new snapshot, no data write
    assert not t.commit_merged(df, 0, [0, 1, 2, 3], 1)
    assert t.version == 0
    assert t.read_live(spark).count() == 1


def test_untouched_buckets_survive(spark, tmpdir_path):
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    d1 = _df(spark, [("r1", "p1", 1, "U"), ("r2", "p2", 1, "U")])
    t.commit_merged(d1, 0, sorted({r[BUCKET_COL] for r in d1.select(BUCKET_COL).collect()}), 1)
    # second commit touches only r1's bucket
    d2 = _df(spark, [("r1", "p1", 5, "U")])
    b2 = sorted({r[BUCKET_COL] for r in d2.select(BUCKET_COL).collect()})
    t.commit_merged(d2, 1, b2, 5)
    rows = {(r["repo"], r["seq_no"]) for r in t.read_live(spark).collect()}
    assert rows == {("r1", 5), ("r2", 1)}


def test_bucket_pruned_read(spark, tmpdir_path):
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    df = _df(spark, [(f"r{i}", f"p{i}", i, "U") for i in range(20)])
    touched = sorted({r[BUCKET_COL] for r in df.select(BUCKET_COL).collect()})
    t.commit_merged(df, 0, touched, 19)
    m = t.latest()
    one_bucket = int(next(iter(m["files"])))
    pruned = t.read(spark, buckets=[one_bucket])
    # only that bucket's files are scanned
    assert {f.removeprefix("file://") for f in pruned.inputFiles()} == {
        str(Path(tmpdir_path) / f) for f in m["files"][str(one_bucket)]
    }
    assert pruned.select(BUCKET_COL).distinct().collect()[0][0] == one_bucket


def test_tombstones_hidden_from_live(spark, tmpdir_path):
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    df = _df(spark, [("r1", "p1", 1, "U"), ("r2", "p2", 2, "D")])
    t.commit_merged(df, 0, [0, 1, 2, 3], 2)
    assert t.read(spark).count() == 2  # tombstone retained in state
    assert t.read_live(spark).count() == 1  # hidden from queries


def test_torn_commit_invisible(spark, tmpdir_path):
    """A crashed writer leaves only a tmp manifest — readers never see it."""
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    t.commit_merged(_df(spark, [("r1", "p1", 1, "U")]), 0, [0, 1, 2, 3], 1)
    (Path(tmpdir_path) / "_log" / ".tmp.partial").write_text('{"version": 99}')
    assert t.version == 0
    assert t.committed_batches() == {0}
    assert t.read_live(spark).count() == 1


def test_manifest_is_atomic_and_versioned(spark, tmpdir_path):
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    for i in range(3):
        t.commit_merged(_df(spark, [("r1", "p1", i, "U")]), i, [0, 1, 2, 3], i)
    logs = sorted(Path(tmpdir_path, "_log").glob("v*.json"))
    assert [json.loads(p.read_text())["version"] for p in logs] == [0, 1, 2]
    assert t.committed_batches() == {0, 1, 2}


def test_latest_returns_isolated_copy(spark, tmpdir_path):
    """latest()/manifest_at() must not hand out the in-process cache by
    reference — a caller mutating the returned manifest (e.g. popping a
    bucket while post-processing) must not poison subsequent reads or the
    next commit."""
    t = SnapshotTable(tmpdir_path, ["repo", "path"], n_buckets=4)
    df = _df(spark, [(f"r{i}", f"p{i}", i, "U") for i in range(10)])
    touched = sorted({r[BUCKET_COL] for r in df.select(BUCKET_COL).collect()})
    t.commit_merged(df, 0, touched, 9)
    m = t.latest()
    m["files"].clear()
    m["committed_extra"].append(99)
    m["offsets"]["0"] = -5
    m2 = t.latest()
    assert m2["files"] and m2["committed_extra"] != [99]
    assert t.read_live(spark).count() == 10
    assert not t.is_committed(99)
