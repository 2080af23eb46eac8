"""Write-audit-publish (Iceberg WAP analogue): staged batches are invisible
until published, auditable in place, sweep-protected, and publish is
observationally identical to a direct commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omop_meds_spark.table import BUCKET_COL, SnapshotTable, bucket_expr


def _df(spark, rows):
    df = spark.createDataFrame(rows, "repo string, path string, seq_no long, op string")
    return df.withColumn(BUCKET_COL, bucket_expr(["repo", "path"], 4))


def _seed(spark, root):
    t = SnapshotTable(root, ["repo", "path"], n_buckets=4)
    t.commit_delta_auto(_df(spark, [("r1", "p1", 1, "U"), ("r2", "p2", 2, "U")]), 0)
    return t


def test_stage_is_invisible_then_publish_makes_it_live(spark, tmpdir_path):
    t = _seed(spark, tmpdir_path)
    v0, wm0 = t.version, t.watermark()
    assert t.stage_delta(_df(spark, [("r1", "p1", 9, "U"), ("r3", "p3", 8, "U")]),
                         batch_id=1, name="audit1")["n_keys"] == 2
    # invisible everywhere
    assert t.version == v0 and t.watermark() == wm0
    assert not t.is_committed(1)
    live = {(r["repo"], r["seq_no"]) for r in t.read_live(spark).collect()}
    assert live == {("r1", 1), ("r2", 2)}
    assert "audit1" in t.staged()
    # audit read sees exactly the staged rows
    staged = {(r["repo"], r["seq_no"]) for r in t.read_staged(spark, "audit1").collect()}
    assert staged == {("r1", 9), ("r3", 8)}
    # publish → atomically live, watermark/offsets/feed advance
    assert t.publish_staged("audit1")
    assert t.staged() == {}
    assert t.is_committed(1) and t.watermark() == 9
    live = {(r["repo"], r["seq_no"]) for r in t.read_live(spark).collect()}
    assert live == {("r1", 9), ("r2", 2), ("r3", 8)}
    feed = t.read_changes(spark, since_version=v0)
    assert {(r["repo"], r["seq_no"]) for r in feed.collect()} == {("r1", 9), ("r3", 8)}
    lin = t.batch_lineage(1)
    assert lin["staged_as"] == "audit1" and lin["n_keys"] == 2


def test_publish_matches_direct_commit_exactly(spark, tmpdir_path):
    rows1 = [("r1", "p1", 1, "U"), ("r2", "p2", 2, "U")]
    rows2 = [("r1", "p1", 9, "U"), ("r2", "p2", 3, "D")]
    ta = _seed(spark, f"{tmpdir_path}/a")
    ta.stage_delta(_df(spark, rows2), 1, "s")
    ta.publish_staged("s")
    tb = _seed(spark, f"{tmpdir_path}/b")
    tb.commit_delta_auto(_df(spark, rows2), 1)
    for tt in (ta, tb):
        assert tt.version == 1 and tt.watermark() == 9
        assert tt.offsets() == ta.offsets()
    sa = sorted(map(tuple, ta.read_live(spark).select("repo", "path", "seq_no").collect()))
    sb = sorted(map(tuple, tb.read_live(spark).select("repo", "path", "seq_no").collect()))
    assert sa == sb == [("r1", "p1", 9)]
    assert rows1  # seed rows used by both sides


def test_drop_staged_removes_files_and_fsck_never_flags_pending(spark, tmpdir_path):
    t = _seed(spark, tmpdir_path)
    t.stage_delta(_df(spark, [("r9", "p9", 5, "U")]), 1, "pending")
    # sweep-protection: neither fsck nor vacuum may touch staged files
    assert t.fsck()["orphan_files"] == []
    t.commit_delta_auto(_df(spark, [("r2", "p2", 7, "U")]), 2)
    t.commit_delta_auto(_df(spark, [("r2", "p2", 8, "U")]), 3)
    t.vacuum(keep_versions=1)
    staged = t.read_staged(spark, "pending")
    assert staged is not None and staged.count() == 1
    # drop: files gone, report clean, idempotent
    assert t.drop_staged("pending")
    assert not t.drop_staged("pending")
    assert t.read_staged(spark, "pending") is None
    assert t.fsck()["orphan_files"] == []


def test_fast_forward_guard_and_override(spark, tmpdir_path):
    t = _seed(spark, tmpdir_path)
    t.stage_delta(_df(spark, [("r1", "p1", 9, "U")]), 1, "old")
    t.commit_delta_auto(_df(spark, [("r2", "p2", 7, "U")]), 2)  # head moves
    with pytest.raises(RuntimeError, match="re-audit"):
        t.publish_staged("old")
    assert t.publish_staged("old", require_fast_forward=False)
    live = {(r["repo"], r["seq_no"]) for r in t.read_live(spark).collect()}
    assert live == {("r1", 9), ("r2", 7)}
    lin = t.batch_lineage(1)
    assert lin["staged_base_version"] == 0 and lin["published_at_version"] == 2


def test_publish_is_idempotent_across_crash_window(spark, tmpdir_path):
    t = _seed(spark, tmpdir_path)
    t.stage_delta(_df(spark, [("r1", "p1", 9, "U")]), 1, "s")
    s_path = t._staged_path("s")
    marker = s_path.read_text()
    assert t.publish_staged("s")
    # simulate crash AFTER _publish but BEFORE the marker unlink
    s_path.write_text(marker)
    assert t.publish_staged("s") is False  # heals: cleans marker, no new version
    assert t.version == 1
    assert not s_path.exists()


def test_staged_cli_list_publish_drop(spark, tmpdir_path, capsys):
    import json

    from omop_meds_spark.__main__ import main

    t = _seed(spark, tmpdir_path)
    t.stage_delta(_df(spark, [("r1", "p1", 9, "U")]), 1, "cli-a")
    t.stage_delta(_df(spark, [("r2", "p2", 7, "U")]), 2, "cli-b")
    assert main(["staged", "--table", str(tmpdir_path)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["staged"]) == {"cli-a", "cli-b"}
    assert main(["staged", "--table", str(tmpdir_path), "--publish", "cli-a"]) == 0
    pub = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pub["published"] == "cli-a" and pub["version"] == 1
    # cli-b was based on v0; the guard fires, --force overrides
    assert main(["staged", "--table", str(tmpdir_path), "--publish", "cli-b",
                 "--force"]) == 0
    pub2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pub2["published"] == "cli-b" and pub2["version"] == 2
    assert main(["staged", "--table", str(tmpdir_path), "--drop", "nope"]) == 0
    dr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dr == {"dropped": False, "staged": {}}


def test_duplicate_stage_name_and_committed_batch_rejected(spark, tmpdir_path):
    t = _seed(spark, tmpdir_path)
    t.stage_delta(_df(spark, [("r1", "p1", 9, "U")]), 1, "s")
    with pytest.raises(RuntimeError, match="already exists"):
        t.stage_delta(_df(spark, [("r1", "p1", 10, "U")]), 2, "s")
    # staging an already-committed batch id is a no-op
    assert t.stage_delta(_df(spark, [("rX", "pX", 1, "U")]), 0, "dup") is None
    assert "dup" not in t.staged()
