"""Transactional bucket-layout evolution (SnapshotTable.rebucket).

The day-one partition count never survives 100x growth; rebucket() must
change it with zero logical impact: identical live state, point lookups
on the new layout, a silent change feed, exactly-once resume intact, and
crash windows that heal. (Iceberg partition-spec-evolution analogue.)
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from omop_meds_spark.table import BUCKET_COL, SnapshotTable, bucket_expr

KEYS = ["repo", "path"]


def _delta(spark, rows, n_buckets,
           schema="repo string, path string, seq_no long, op string, event_id long"):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn(BUCKET_COL, bucket_expr(KEYS, n_buckets))


def _touched(df):
    return sorted({r[BUCKET_COL] for r in df.select(BUCKET_COL).distinct().collect()})


def _live_rows(spark, t):
    df = t.read_live(spark)
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _build(spark, root, n_buckets=4):
    t = SnapshotTable(root, KEYS, n_buckets=n_buckets)
    rows0 = [(f"r{i}", f"p{i % 3}", i, "U", i) for i in range(24)]
    d0 = _delta(spark, rows0, n_buckets)
    t.commit_delta(d0, 0, _touched(d0), 24,
                   offsets={b: 24 for b in _touched(d0)})
    rows1 = [(f"r{i}", f"p{i % 3}", 100 + i, "D" if i % 5 == 0 else "U", 100 + i)
             for i in range(0, 24, 2)]
    d1 = _delta(spark, rows1, n_buckets)
    t.commit_delta(d1, 1, _touched(d1), 124,
                   offsets={b: 124 for b in _touched(d1)})
    return t


@pytest.mark.parametrize("new_n", [16, 2])
def test_rebucket_preserves_state_and_layout(spark, tmpdir_path, new_n):
    t = _build(spark, tmpdir_path)
    before = _live_rows(spark, t)
    committed = t.committed_batches()
    wm = t.watermark()

    assert t.rebucket(spark, new_n)
    assert t.n_buckets == new_n
    assert _live_rows(spark, t) == before
    assert t.committed_batches() == committed and t.watermark() == wm
    m = t.latest()
    assert m["n_buckets"] == new_n
    # every live file sits under a new-layout bucket id, one generation each
    assert all(int(b) < new_n and len(fs) == 1 for b, fs in m["files"].items())
    # no-op when already on the requested layout
    assert not t.rebucket(spark, new_n)

    # a fresh open adopts the new layout; the pre-rebucket count errors
    t2 = SnapshotTable(tmpdir_path, KEYS)
    assert t2.n_buckets == new_n
    assert _live_rows(spark, t2) == before
    with pytest.raises(ValueError, match="rebucket"):
        SnapshotTable(tmpdir_path, KEYS, n_buckets=4)


def test_rebucket_point_lookup_and_change_feed(spark, tmpdir_path):
    t = _build(spark, tmpdir_path)
    v_before = t.version
    assert t.rebucket(spark, 16)

    # point lookup probes the NEW layout's bucket
    got = t.lookup(spark, {"repo": "r1", "path": "p1"}).collect()
    assert len(got) == 1 and got[0]["seq_no"] == 1

    # the change feed is SILENT across the rebucket (compaction-like:
    # no files_add, so no spurious change rows)
    assert t.read_changes(spark, since_version=v_before) is None

    # and a post-rebucket commit flows through the feed normally
    d = _delta(spark, [("r1", "p1", 999, "U", 999)], t.n_buckets)
    t.commit_delta(d, 2, _touched(d), 999)
    ch = t.read_changes(spark, since_version=v_before)
    assert [r["seq_no"] for r in ch.collect()] == [999]


def test_rebucket_rekeys_resume_offsets(spark, tmpdir_path):
    """offsets are per-bucket resume cursors for external tailers; after a
    layout change the old keys address the wrong buckets, so rebucket must
    RESET the map and re-key every live new bucket at the watermark (all
    applied events are folded into the rewrite, so wm is exact)."""
    t = _build(spark, tmpdir_path)
    wm = t.watermark()
    assert t.offsets()  # old-layout cursors exist (keys < 4)

    assert t.rebucket(spark, 16)
    live_buckets = {int(b) for b in t.latest()["files"]}
    assert t.offsets() == {b: wm for b in live_buckets}

    # a fresh open (no in-process cache — pure log replay) agrees
    assert SnapshotTable(tmpdir_path, KEYS).offsets() == {
        b: wm for b in live_buckets}

    # post-rebucket commits merge into the NEW keyspace normally
    d = _delta(spark, [("r1", "p1", 999, "U", 999)], t.n_buckets)
    t.commit_delta(d, 2, _touched(d), 999,
                   offsets={b: 999 for b in _touched(d)})
    off = t.offsets()
    assert max(off.values()) == 999 and all(v >= wm for v in off.values())


def test_rebucket_crash_window_heals_on_open(spark, tmpdir_path):
    """Manifest published but _table.json not yet re-stamped (the one
    non-atomic window): the next open must adopt the LOG's layout and
    heal the mirror."""
    t = _build(spark, tmpdir_path)
    assert t.rebucket(spark, 16)
    # simulate the crash: restore the stale pre-rebucket mirror
    meta = Path(tmpdir_path) / "_table.json"
    stale = json.loads(meta.read_text())
    stale["n_buckets"] = 4
    meta.write_text(json.dumps(stale))

    t2 = SnapshotTable(tmpdir_path, KEYS)
    assert t2.n_buckets == 16
    assert json.loads(meta.read_text())["n_buckets"] == 16  # healed
    got = t2.lookup(spark, {"repo": "r1", "path": "p1"}).collect()
    assert len(got) == 1


def test_time_travel_across_rebucket_falls_back_to_full_read(spark, tmpdir_path):
    t = _build(spark, tmpdir_path)
    v_old = t.version
    old_rows = {(r["repo"], r["path"], r["seq_no"])
                for r in t.read_live(spark).collect()}
    assert t.rebucket(spark, 16)

    # bucket ids computed under the CURRENT layout against an OLD version:
    # pruning must not lose rows (guard falls back to an unpruned read)
    some_new_bucket = [int(b) for b in t.latest()["files"]][:1]
    df = t.read_live(spark, buckets=some_new_bucket, version=v_old)
    got = {(r["repo"], r["path"], r["seq_no"]) for r in df.collect()}
    assert got == old_rows


def test_vacuum_after_rebucket_reclaims_old_layout(spark, tmpdir_path):
    """After a layout change, the old layout's data files are referenced
    only by pre-rebucket versions; a retention-1 vacuum must reclaim every
    one of them while the rewritten table stays byte-identical."""
    t = _build(spark, tmpdir_path)
    before = _live_rows(spark, t)
    assert t.rebucket(spark, 16)

    res = t.vacuum(keep_versions=1)
    assert res["deleted_files"] > 0 and res["dropped_manifests"] > 0
    assert _live_rows(spark, t) == before

    # everything left on disk belongs to the rebucket rewrite generation
    left = {p.relative_to(t.root).parts[1]
            for p in (Path(tmpdir_path) / "data").rglob("*.parquet")}
    assert left == {f"rebucket{t.version:06d}"}
    # pre-rebucket versions are cleanly gone, and the survivor reads fine
    assert t.manifest_at(0) is None
    assert len(t.lookup(spark, {"repo": "r1", "path": "p1"}).collect()) == 1


def test_incremental_view_refresh_across_source_rebucket(spark, tmpdir_path):
    """A materialized view folding the change feed must stay exact when the
    SOURCE table is rebucketed between folds (the old-version state read
    crosses the layout change)."""
    from pyspark.sql import functions as F

    from omop_meds_spark.operators.incremental import IncrementalAggView

    src = _build(spark, f"{tmpdir_path}/src")
    view = IncrementalAggView(f"{tmpdir_path}/mv", src, dims=["path"],
                              sum_cols=["seq_no"])
    assert view.refresh(spark)

    assert src.rebucket(spark, 16)
    d = _delta(spark, [("r1", "p1", 500, "U", 500), ("rX", "p2", 501, "U", 501)],
               src.n_buckets)
    src.commit_delta(d, 2, _touched(d), 501)
    assert view.refresh(spark)

    got = {(r["path"], r["n_rows"], int(r["sum_seq_no"]))
           for r in view.read(spark).collect()}
    live = src.read_live(spark).groupBy("path").agg(
        F.count("*").alias("n"), F.sum("seq_no").alias("s"))
    want = {(r["path"], r["n"], int(r["s"])) for r in live.collect()}
    assert got == want
