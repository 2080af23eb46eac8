"""Incrementally-maintained SCD2 history view (operators/incremental.py
SCD2View): per-commit version logs folded from the change feed, intervals
computed on read. The invariants pinned here: refresh cadence does not
matter (per-commit refreshes == one catch-up refresh), late/out-of-order
commits land in seq position without interval surgery, deletes close
intervals, and replayed refreshes are no-ops."""

from __future__ import annotations

from omop_meds_spark.operators.incremental import SCD2View
from omop_meds_spark.table import BUCKET_COL, SnapshotTable, bucket_expr

KEYS = ["k"]
SCHEMA = "k string, event_id string, seq_no long, attr string, op string"


def _commit(spark, t, rows, batch_id):
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        BUCKET_COL, bucket_expr(KEYS, t.n_buckets))
    t.commit_delta_auto(df, batch_id)


def _intervals(spark, view):
    df = view.read_intervals(spark)
    return {(r["k"], r["seq"], r["valid_from"], r["valid_to"], r["is_current"],
             r["attr"]) for r in df.collect()}


BATCHES = [
    [("A", "e1", 10, "x", "U"), ("B", "e2", 11, "p", "U")],
    [("A", "e3", 30, "y", "U"), ("B", "e4", 31, "q", "D")],   # delete B
    [("A", "e5", 20, "mid", "U")],                             # LATE: lands between
    [("B", "e6", 40, "r", "U")],                               # re-insert B
]

WANT = {
    ("A", 10, 10, 20, False, "x"),
    ("A", 20, 20, 30, False, "mid"),   # late row split the old interval
    ("A", 30, 30, None, True, "y"),
    ("B", 11, 11, 31, False, "p"),     # closed by the delete
    ("B", 40, 40, None, True, "r"),
}


def test_scd2_view_per_commit_refresh(spark, tmpdir_path):
    t = SnapshotTable(f"{tmpdir_path}/src", KEYS, n_buckets=4)
    v = SCD2View(f"{tmpdir_path}/view", t, n_buckets=4)
    for b, rows in enumerate(BATCHES):
        _commit(spark, t, rows, b)
        assert v.refresh(spark) is True
    assert _intervals(spark, v) == WANT
    assert v.refresh(spark) is False  # nothing new: no-op


def test_scd2_view_catch_up_refresh_identical(spark, tmpdir_path):
    t = SnapshotTable(f"{tmpdir_path}/src", KEYS, n_buckets=4)
    v = SCD2View(f"{tmpdir_path}/view", t, n_buckets=4)
    for b, rows in enumerate(BATCHES):
        _commit(spark, t, rows, b)
    assert v.refresh(spark) is True   # one fold over the whole feed
    assert _intervals(spark, v) == WANT


def test_scd2_view_log_grain_and_exactly_once(spark, tmpdir_path):
    t = SnapshotTable(f"{tmpdir_path}/src", KEYS, n_buckets=4)
    v = SCD2View(f"{tmpdir_path}/view", t, n_buckets=4)
    # intra-batch churn collapses to the batch winner (per-commit grain:
    # the engine commits LWW winners, so the feed never carries losers)
    from omop_meds_spark.operators.upsert import last_writer_wins

    raw = spark.createDataFrame(
        [("A", "e1", 1, "v1", "U"), ("A", "e2", 2, "v2", "U")], SCHEMA)
    t.commit_delta_auto(last_writer_wins(raw, KEYS), 0)
    v.refresh(spark)
    log = {(r["k"], r["seq"], r["attr"]) for r in v.read_log(spark).collect()}
    assert log == {("A", 2, "v2")}
    # a re-opened view recovers its cursor from lineage; replay is a no-op
    v2 = SCD2View(f"{tmpdir_path}/view", t)
    assert v2.cursor == t.version
    assert v2.refresh(spark) is False


def test_scd2_view_source_schema_evolution(spark, tmpdir_path):
    """The source payload gains a column between folds: old log entries
    carry NULL for it, new entries carry it, intervals read coherently —
    and the reverse (a column the stored logs have but the new feed
    lacks) also merges."""
    t = SnapshotTable(f"{tmpdir_path}/src", KEYS, n_buckets=4)
    v = SCD2View(f"{tmpdir_path}/view", t, n_buckets=4)
    _commit(spark, t, [("A", "e1", 10, "x", "U")], 0)          # v0: attr only
    v.refresh(spark)
    wide = spark.createDataFrame(
        [("A", "e2", 20, "y", "U", 7)],
        SCHEMA + ", extra long").withColumn(
        BUCKET_COL, bucket_expr(KEYS, t.n_buckets))
    t.commit_delta_auto(wide, 1)                                # v1: + extra
    v.refresh(spark)
    got = {(r["seq"], r["attr"], r["extra"], r["valid_to"], r["is_current"])
           for r in v.read_intervals(spark).collect()}
    assert got == {(10, "x", None, 20, False), (20, "y", 7, None, True)}
    # narrow again: the feed drops 'extra'; stored entries keep theirs
    _commit(spark, t, [("A", "e3", 30, "z", "U")], 2)
    v.refresh(spark)
    got = {(r["seq"], r["attr"], r["extra"], r["is_current"])
           for r in v.read_intervals(spark).collect()}
    assert got == {(10, "x", None, False), (20, "y", 7, False),
                   (30, "z", None, True)}


def test_runner_maintains_scd2_view_end_to_end(spark, tmpdir_path):
    """SCD2View is runner-attachable like any view (duck-typed refresh):
    over a real WAL replay, the view's OPEN intervals must equal the
    table's live state, and its full log must count every commit's
    winner rows (per-commit grain)."""
    from pyspark.sql import functions as F

    from omop_meds_spark.runner import CDCRunner
    from omop_meds_spark.sources.gen import generate_wal

    wal = f"{tmpdir_path}/wal"
    generate_wal(wal, n_events=4000, n_repos=8, paths_per_repo=20,
                 n_files=6, seed=13)
    r = CDCRunner(spark, wal, f"{tmpdir_path}/t", n_buckets=8,
                  files_per_batch=2)
    v = SCD2View(f"{tmpdir_path}/hist", r.table, n_buckets=8)
    r.views.append(v)
    assert r.run()
    iv = v.read_intervals(spark)
    open_rows = {(x["repo"], x["path"], x["content_sha256"])
                 for x in iv.filter(F.col("is_current")).collect()}
    live = {(x["repo"], x["path"], x["content_sha256"])
            for x in r.final_state().collect()}
    assert open_rows == live and len(live) > 0
    # full log counts every commit's winners exactly once
    n_log = v.read_log(spark).count()
    n_feed = r.table.read_changes(spark, since_version=-1).count()
    assert n_log == n_feed


def test_scd2_view_read_asof(spark, tmpdir_path):
    """Point-in-time reads from the history view: the covering interval's
    payload per key; deleted-at-that-point keys are absent."""
    t = SnapshotTable(f"{tmpdir_path}/src", KEYS, n_buckets=4)
    v = SCD2View(f"{tmpdir_path}/view", t, n_buckets=4)
    for b, rows in enumerate(BATCHES):
        _commit(spark, t, rows, b)
    v.refresh(spark)

    def asof(s):
        return {(r["k"], r["attr"]) for r in v.read_asof(spark, s).collect()}

    assert asof(25) == {("A", "mid"), ("B", "p")}   # mid interval for both
    assert asof(35) == {("A", "y")}                  # B deleted at seq 31
    assert asof(45) == {("A", "y"), ("B", "r")}      # B re-inserted at 40
    assert asof(5) == set()                          # before any version
