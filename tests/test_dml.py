"""Row-level DML: delete_where (soft, change-feed visible) and
purge_keys/purge_where (hard, physical rewrite) — the two-phase GDPR
erase protocol delete → purge → vacuum."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from omop_meds_spark.table import BUCKET_COL, SnapshotTable, bucket_expr

KEYS = ["repo", "path"]
SCH = ("repo string, path string, val long, seq_no long, "
       "event_id string, op string")


def _d(spark, rows, n_buckets=2):
    df = spark.createDataFrame(rows, SCH)
    return df.withColumn(BUCKET_COL, bucket_expr(KEYS, n_buckets))


def _live(spark, t):
    df = t.read_live(spark)
    if df is None:
        return set()
    return {(r["repo"], r["path"], r["val"]) for r in df.collect()}


def _mk(spark, root):
    """Three keys, one of them updated across two batches (so its bucket
    holds multiple generations with a stale loser payload on disk)."""
    t = SnapshotTable(root, KEYS, n_buckets=2)
    t.commit_delta_auto(_d(spark, [
        ("alice", "a.py", 1, 0, "e0", "U"),
        ("bob", "b.py", 2, 1, "e1", "U"),
        ("carol", "c.py", 3, 2, "e2", "U"),
    ]), 0)
    t.commit_delta_auto(_d(spark, [
        ("alice", "a.py", 10, 3, "e3", "U"),
    ]), 1)
    return t


def test_delete_where_soft_delete(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    v_before, wm_before = t.version, t.watermark()
    out = t.delete_where(spark, "repo = 'alice'")
    assert out["deleted"] == 1 and out["version"] == v_before + 1
    # hidden from live, but history is intact (time travel sees it)
    assert _live(spark, t) == {("bob", "b.py", 2), ("carol", "c.py", 3)}
    old = {(r["repo"], r["val"])
           for r in t.read_live(spark, version=v_before).collect()}
    assert ("alice", 10) in old
    # the change feed announces the delete with the row's pre-image
    feed = t.read_changes(spark, since_version=v_before).collect()
    assert {(r["repo"], r["op"], r["val"]) for r in feed} == {
        ("alice", "D", 10)}
    # watermark untouched; WAL batch ids not consumed
    assert t.watermark() == wm_before
    assert not t.is_committed(2)
    # lineage records the DML and its predicate
    bid = max(t.committed_batches())
    lin = t.batch_lineage(bid)
    assert lin["dml"] == "delete" and "alice" in lin["predicate"]


def test_delete_loses_to_next_real_event(spark, tmpdir_path):
    """Upstream activity after the DELETE wins — CDC ordering: the
    tombstone sits at seq=watermark, below the source's next event."""
    t = _mk(spark, tmpdir_path)
    t.delete_where(spark, "repo = 'alice'")
    t.commit_delta_auto(_d(spark, [("alice", "a.py", 99, 4, "e4", "U")]), 2)
    assert ("alice", "a.py", 99) in _live(spark, t)
    # and a REDELIVERED pre-delete event does not resurrect the row
    t2 = SnapshotTable(f"{tmpdir_path}2", KEYS, n_buckets=2)
    t2.commit_delta_auto(_d(spark, [("alice", "a.py", 1, 0, "e0", "U")]), 0)
    t2.delete_where(spark, "repo = 'alice'")
    t2.commit_delta_auto(_d(spark, [("alice", "a.py", 1, 0, "e0", "U")]), 7)
    assert _live(spark, t2) == set()


def test_delete_where_no_match_is_noop(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    v = t.version
    assert t.delete_where(spark, "repo = 'nobody'") == {
        "deleted": 0, "version": v}
    assert t.version == v


def _scan_all_parquet_for(root: Path, needle: str) -> bool:
    """True when any parquet file under root holds the needle in any
    string column — the raw-disk GDPR check."""
    for p in Path(root).rglob("*.parquet"):
        tb = pq.read_table(p)
        for col in tb.column_names:
            c = tb.column(col)
            if c.type == "string" and needle in set(
                    x for x in c.to_pylist() if x is not None):
                return True
    return False


def test_purge_erases_across_generations_and_disk(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    # phase 1: announce (consumers fold the tombstone from the feed)
    t.delete_where(spark, "repo = 'alice'")
    # phase 2: physical rewrite of alice's bucket, all generations
    out = t.purge_where(spark, "repo = 'alice'")
    # the live row is already tombstoned, so the predicate matches nothing —
    # purge the KEY explicitly (erase-regardless-of-current-state)
    assert out["purged_keys"] == 0
    keys = spark.createDataFrame([("alice", "a.py")], "repo string, path string")
    out = t.purge_keys(spark, keys)
    assert out["purged_keys"] == 1 and out["buckets"]
    # current layout holds NO generation of the key — not even the
    # tombstone or the stale val=1 loser
    cur = t.read(spark).filter("repo = 'alice'")
    assert cur.count() == 0
    hit = t.lookup(spark, {"repo": "alice", "path": "a.py"})
    assert hit is None or hit.count() == 0  # None = manifest-pruned absent
    # survivors intact
    assert _live(spark, t) == {("bob", "b.py", 2), ("carol", "c.py", 3)}
    # phase 3: vacuum retires pre-purge snapshots and unlinks their files;
    # after it, the bytes are gone from the entire table directory
    assert _scan_all_parquet_for(t.root, "alice")  # still on disk pre-vacuum
    t.vacuum(keep_versions=1)
    assert not _scan_all_parquet_for(t.root, "alice")
    assert _live(spark, t) == {("bob", "b.py", 2), ("carol", "c.py", 3)}


def test_purge_where_matches_live_winners(spark, tmpdir_path):
    """purge_where selects by CURRENT state: matching on the live winner
    erases the key even though older generations carry other values."""
    t = _mk(spark, tmpdir_path)
    out = t.purge_where(spark, "val = 10")  # alice's live winner
    assert out["purged_keys"] == 1
    assert t.read(spark).filter("repo = 'alice'").count() == 0
    t.vacuum(keep_versions=1)
    assert not _scan_all_parquet_for(t.root, "alice")


def test_purge_untouched_buckets_survive_byte_identical(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    m0 = t.latest()
    kdf = spark.createDataFrame([("alice", "a.py")], "repo string, path string")
    b_alice = t.key_bucket(spark, {"repo": "alice", "path": "a.py"})
    t.purge_keys(spark, kdf)
    m1 = t.latest()
    for b, files in m0["files"].items():
        if int(b) != b_alice:
            assert m1["files"][b] == files  # file lists carried over verbatim


def test_purge_refuses_staged_commits(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.stage_delta(_d(spark, [("dave", "d.py", 4, 9, "e9", "U")]), 5, "audit1")
    kdf = spark.createDataFrame([("alice", "a.py")], "repo string, path string")
    with pytest.raises(ValueError, match="staged"):
        t.purge_keys(spark, kdf)
    t.drop_staged("audit1")
    assert t.purge_keys(spark, kdf)["purged_keys"] == 1


def test_purge_is_not_a_logical_change(spark, tmpdir_path):
    """The rewrite rides the compaction path: the change feed across the
    purge version shows nothing (deletion is announced by delete_where)."""
    t = _mk(spark, tmpdir_path)
    v = t.version
    kdf = spark.createDataFrame([("alice", "a.py")], "repo string, path string")
    t.purge_keys(spark, kdf)
    assert t.read_changes(spark, since_version=v) is None


def test_dml_cli_roundtrip(spark, tmpdir_path, capsys):
    from omop_meds_spark.__main__ import main

    wal, tbl = f"{tmpdir_path}/wal", f"{tmpdir_path}/tbl"
    assert main(["gen", "--wal", wal, "--events", "2000", "--repos", "8",
                 "--files", "2"]) == 0
    assert main(["replay", "--wal", wal, "--table", tbl, "--cores", "8"]) == 0
    capsys.readouterr()
    assert main(["delete", "--table", tbl, "--where", "repo = 'repo_0'",
                 "--cores", "8"]) == 0
    dl = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dl["deleted"] > 0
    assert main(["purge", "--table", tbl, "--where", "repo = 'repo_0'",
                 "--vacuum", "--cores", "8"]) == 0
    pg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # delete tombstoned the live rows, so the predicate no longer matches —
    # the CLI purge is a no-op by design; the erase path for tombstoned
    # keys is purge_keys. Re-run against a live repo instead.
    assert pg["purged_keys"] == 0
    assert main(["purge", "--table", tbl, "--where", "repo = 'repo_1'",
                 "--vacuum", "--cores", "8"]) == 0
    pg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pg["purged_keys"] > 0 and "vacuum" in pg
    from omop_meds_spark.schemas import KEY_COLS
    t = SnapshotTable(tbl, KEY_COLS)
    live = t.read_live(spark)
    assert live.filter("repo in ('repo_0','repo_1')").count() == 0


def test_delete_numeric_tiebreak_watermark_key(spark, tmpdir_path):
    """Integral event_id tables: the synthesized tombstone tiebreak must be
    the TYPE MAX, not a hash — a hashed tiebreak can be negative and
    silently LOSE to the real event for any key whose winner sits exactly
    at the watermark (the globally-latest key always does)."""
    t = SnapshotTable(tmpdir_path, ["user_id"], n_buckets=2)
    df = spark.createDataFrame(
        [(1, 10, 7, "U"), (2, 11, 9, "U")],
        "user_id long, val long, seq_no long, op string",
    ).withColumn("event_id", (F.col("seq_no") * 1000).cast("long"))
    t.commit_delta_auto(df.withColumn(
        BUCKET_COL, bucket_expr(["user_id"], 2)), 0)
    assert t.watermark() == 9
    # user 2's winner IS the watermark row — the poison case
    out = t.delete_where(spark, "user_id = 2")
    assert out["deleted"] == 1
    live = {r["user_id"] for r in t.read_live(spark).collect()}
    assert live == {1}
    # and the next real event still beats the tombstone
    t.commit_delta_auto(spark.createDataFrame(
        [(2, 99, 12, "U", 12000)],
        "user_id long, val long, seq_no long, op string, event_id long",
    ).withColumn(BUCKET_COL, bucket_expr(["user_id"], 2)), 1)
    rows = {(r["user_id"], r["val"]) for r in t.read_live(spark).collect()}
    assert rows == {(1, 10), (2, 99)}
