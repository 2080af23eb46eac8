"""Optimistic concurrency (opt-in ``concurrent_writers=True``): the
manifest version slot is an atomic no-clobber create (CAS), losers REBASE
pure-append commits onto the new head, duplicate-batch races collapse to
no-ops, and replacing commits (compact) refuse to publish over interleaved
changes they did not see (``ConcurrentWriteConflict``) — the Iceberg
optimistic-commit model, validated deterministically via race injection
plus one real multi-threaded race.
"""

from __future__ import annotations

import threading
from pathlib import Path

import pytest

from omop_meds_spark.table import (
    BUCKET_COL,
    ConcurrentWriteConflict,
    SnapshotTable,
    bucket_expr,
)

KEYS = ["repo", "path"]


def _df(spark, rows):
    df = spark.createDataFrame(
        rows, "repo string, path string, seq_no long, op string")
    return df.withColumn(BUCKET_COL, bucket_expr(KEYS, 4))


def _tab(root) -> SnapshotTable:
    return SnapshotTable(root, KEYS, n_buckets=4, concurrent_writers=True)


def _inject_race(victim: SnapshotTable, rival_commit) -> None:
    """Deterministic race: the FIRST time ``victim`` tries to claim a
    version slot, ``rival_commit()`` runs first and takes it — so the
    victim's CAS loses exactly once and must rebase."""
    real = victim._write_manifest
    fired = {"done": False}

    def wrapper(manifest, version, kind, allow_existing_delta=False):
        if not fired["done"]:
            fired["done"] = True
            rival_commit()
        return real(manifest, version, kind, allow_existing_delta)

    victim._write_manifest = wrapper


def test_lost_append_race_rebases_and_both_commits_land(spark, tmpdir_path):
    t1, t2 = _tab(tmpdir_path), _tab(tmpdir_path)
    assert t1.commit_delta(_df(spark, [("r0", "p0", 1, "U")]), 0, [0, 1, 2, 3], 1)
    _inject_race(t2, lambda: t1.commit_delta(
        _df(spark, [("r1", "p1", 2, "U")]), 1, [0, 1, 2, 3], 2))
    # t2 loses v1 to the rival, rebases, lands at v2 — no error, no loss
    assert t2.commit_delta(_df(spark, [("r2", "p2", 3, "U")]), 2, [0, 1, 2, 3], 3)
    t = _tab(tmpdir_path)
    assert t.version == 2
    rows = {(r["repo"], r["seq_no"]) for r in t.read_live(spark).collect()}
    assert rows == {("r0", 1), ("r1", 2), ("r2", 3)}
    assert t.committed_batches() == {0, 1, 2}
    assert t.watermark() == 3  # max-merged across the raced commits


def test_duplicate_batch_race_is_noop(spark, tmpdir_path):
    """Two writers deliver the SAME batch (redelivery raced across
    processes): exactly one copy lands; the loser's publish reports the
    no-op instead of double-committing."""
    t1, t2 = _tab(tmpdir_path), _tab(tmpdir_path)
    _inject_race(t2, lambda: t1.commit_delta(
        _df(spark, [("r1", "p1", 1, "U")]), 0, [0, 1, 2, 3], 1))
    assert t2.commit_delta(
        _df(spark, [("r1", "p1", 1, "U")]), 0, [0, 1, 2, 3], 1) is False
    t = _tab(tmpdir_path)
    assert t.version == 0
    assert t.read_live(spark).count() == 1
    assert t.committed_batches() == {0}


def test_replace_raced_by_append_on_same_bucket_conflicts(spark, tmpdir_path):
    """Compaction's file list was planned BEFORE the race — publishing it
    over an interleaved append to the same bucket would silently drop that
    append's rows, so the publish must refuse; a re-planned compact (fresh
    head by construction) then succeeds and keeps every row."""
    t1, t2 = _tab(tmpdir_path), _tab(tmpdir_path)
    d = _df(spark, [("r1", "p1", 1, "U")])
    bucket = int(d.select(BUCKET_COL).first()[0])
    t1.commit_delta(d, 0, [bucket], 1)
    t1.commit_delta(_df(spark, [("r1", "p1", 2, "U")]), 1, [bucket], 2)
    _inject_race(t2, lambda: t1.commit_delta(
        _df(spark, [("r1", "p1", 3, "U")]), 2, [bucket], 3))
    with pytest.raises(ConcurrentWriteConflict):
        t2.compact(spark, buckets=[bucket])
    t3 = _tab(tmpdir_path)
    assert t3.compact(spark, buckets=[bucket])
    rows = [(r["repo"], r["seq_no"]) for r in t3.read_live(spark).collect()]
    assert rows == [("r1", 3)]  # the raced append's winner survived


def test_replace_raced_by_append_on_other_bucket_rebases(spark, tmpdir_path):
    """Disjoint-bucket interleavings are safe for a replacing commit — the
    rebase validates and publishes instead of failing."""
    t1, t2 = _tab(tmpdir_path), _tab(tmpdir_path)
    # find two keys living in different buckets
    probe = _df(spark, [(f"r{i}", f"p{i}", 1, "U") for i in range(8)])
    by_bucket: dict[int, str] = {}
    for r in probe.select("repo", BUCKET_COL).collect():
        by_bucket.setdefault(int(r[BUCKET_COL]), r["repo"])
    (b_a, key_a), (b_b, key_b) = sorted(by_bucket.items())[:2]
    t1.commit_delta(_df(spark, [(key_a, f"p{key_a[1:]}", 1, "U")]), 0, [b_a], 1)
    t1.commit_delta(_df(spark, [(key_a, f"p{key_a[1:]}", 2, "U")]), 1, [b_a], 2)
    _inject_race(t2, lambda: t1.commit_delta(
        _df(spark, [(key_b, f"p{key_b[1:]}", 3, "U")]), 2, [b_b], 3))
    assert t2.compact(spark, buckets=[b_a])  # raced, rebased, published
    t = _tab(tmpdir_path)
    rows = {(r["repo"], r["seq_no"]) for r in t.read_live(spark).collect()}
    assert rows == {(key_a, 2), (key_b, 3)}
    assert len(t.latest()["files"][str(b_a)]) == 1  # compaction took effect


def test_threaded_appenders_all_land(spark, tmpdir_path):
    """A REAL race: 6 lease-less writer instances commit distinct batches
    from concurrent threads. Every commit lands exactly once, versions are
    contiguous, and live state is the union — no lost updates, no torn
    log."""
    n = 6
    errors: list[Exception] = []

    def work(i: int) -> None:
        try:
            t = _tab(tmpdir_path)
            assert t.commit_delta(
                _df(spark, [(f"r{i}", f"p{i}", i + 1, "U")]),
                i, [0, 1, 2, 3], i + 1)
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    t = _tab(tmpdir_path)
    assert t.version == n - 1  # n commits, contiguous versions 0..n-1
    assert t.committed_batches() == set(range(n))
    rows = {(r["repo"], r["seq_no"]) for r in t.read_live(spark).collect()}
    assert rows == {(f"r{i}", i + 1) for i in range(n)}


def test_vacuum_min_age_spares_young_unreferenced_files(spark, tmpdir_path):
    """The concurrent-mode vacuum mitigation: files younger than
    ``min_age_s`` are never swept (they may be a lease-less appender's
    staged-but-unpublished write); with the grace disabled the same file
    is reclaimed."""
    t = SnapshotTable(tmpdir_path, KEYS, n_buckets=4)
    for i in range(4):
        t.commit_delta(_df(spark, [(f"r{i}", "p", i + 1, "U")]),
                       i, [0, 1, 2, 3], i + 1)
    orphan = Path(tmpdir_path) / "data" / "inflight" / "bucket=0" / "part-x.parquet"
    orphan.parent.mkdir(parents=True)
    orphan.write_bytes(b"not yet published")
    t.vacuum(keep_versions=2, min_age_s=3600)
    assert orphan.exists()  # young → spared
    t.vacuum(keep_versions=1)  # default: no grace
    assert not orphan.exists()
    assert t.read_live(spark).count() == 4  # live data untouched throughout


def test_two_concurrent_runners_split_one_wal(spark, tmpdir_path):
    """END-TO-END multi-writer ingest: two CDC runners apply DISJOINT batch
    subsets of the same WAL to the same target concurrently (batches
    commute — LWW winners are order-free across batches, appends compose
    under the optimistic protocol). Final state must equal the pandas
    replay oracle exactly — the same fingerprint gate as single-writer."""
    from omop_meds_spark import verify
    from omop_meds_spark.runner import CDCRunner
    from omop_meds_spark.sources.gen import generate_wal, replay_oracle

    wal = Path(tmpdir_path) / "wal"
    table = Path(tmpdir_path) / "t"
    generate_wal(wal, n_events=9000, n_repos=10, paths_per_repo=25,
                 n_files=6, seed=11)
    cols = ["repo", "path", "commit", "lang", "size_bytes",
            "content_sha256", "seq_no"]
    pdf = replay_oracle(str(wal))
    pdf["size_bytes"] = pdf["size_bytes"].astype("Int64")
    expect = verify.pandas_fingerprint(pdf, cols)

    runners = [CDCRunner(spark, wal, table, n_buckets=8, files_per_batch=2,
                         concurrent_writers=True) for _ in range(2)]
    batches = runners[0].reader.plan_batches()
    assert len(batches) >= 3
    errors: list[Exception] = []

    def work(r: CDCRunner, mine) -> None:
        try:
            for b in mine:
                r.apply_batch(b)
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=work, args=(runners[i], batches[i::2]))
               for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    fresh = CDCRunner(spark, wal, table, n_buckets=8, files_per_batch=2)
    assert verify.state_fingerprint(fresh.final_state(), cols) == expect
    # every batch committed exactly once across both writers
    assert fresh.table.committed_batches() == {b.batch_id for b in batches}


def test_k_consecutive_lost_races_still_publish_exactly_once(spark, tmpdir_path):
    """A writer that loses FIVE straight version races (a rival lands a
    new commit every time it retries) still publishes exactly once, at the
    final head — the rebase loop converges instead of livelocking or
    double-writing."""
    t1, t2 = _tab(tmpdir_path), _tab(tmpdir_path)
    real = t2._write_manifest
    state = {"losses": 0}

    def wrapper(manifest, version, kind, allow_existing_delta=False):
        if state["losses"] < 5:
            i = state["losses"]
            state["losses"] += 1
            t1.commit_delta(_df(spark, [(f"rival{i}", "p", 10 + i, "U")]),
                            100 + i, [0, 1, 2, 3], 10 + i)
        return real(manifest, version, kind, allow_existing_delta)

    t2._write_manifest = wrapper
    assert t2.commit_delta(_df(spark, [("mine", "p", 1, "U")]), 0, [0, 1, 2, 3], 1)
    assert state["losses"] == 5
    t = _tab(tmpdir_path)
    assert t.version == 5  # five rival commits + one rebased publish
    rows = {r["repo"] for r in t.read_live(spark).collect()}
    assert rows == {"mine", *{f"rival{i}" for i in range(5)}}
    assert t.committed_batches() == {0, 100, 101, 102, 103, 104}
    assert t.watermark() == 14


@pytest.mark.parametrize("seed", [3, 11, 29, 47, 61, 83])
def test_fuzz_raced_commit_sequences_model_checked(spark, tmpdir_path, seed):
    """Randomized interleaving fuzz: three lease-less writers run a random
    sequence of appends / duplicate redeliveries / compactions / vacuums,
    with CAS losses injected at random points (a rival commits first).
    After every operation the table must equal a pure-Python LWW model —
    live rows, committed batches, and watermark. The deterministic tests
    above pin each conflict class; this sweeps their compositions."""
    import random

    rng = random.Random(seed)
    writers = [_tab(tmpdir_path) for _ in range(3)]
    keys = [f"r{i}" for i in range(6)]
    model: dict[str, tuple[int, str]] = {}  # key -> (seq, op), max-seq wins
    committed: set[int] = set()
    batches: dict[int, list[tuple[str, str, int, str]]] = {}
    next_batch, next_seq = 0, 1

    def commit(w: SnapshotTable, batch_id: int, rows) -> bool:
        ok = w.commit_delta(_df(spark, rows), batch_id, [0, 1, 2, 3],
                            max(r[2] for r in rows))
        return ok

    def fresh_rows():
        nonlocal next_seq
        rows = []
        for k in rng.sample(keys, rng.randint(1, 3)):
            rows.append((k, f"p{k[1:]}", next_seq, rng.choice("UUD")))
            next_seq += 1
        return rows

    def apply_to_model(rows, batch_id):
        committed.add(batch_id)
        for k, _, s, op in rows:
            if k not in model or s > model[k][0]:
                model[k] = (s, op)

    for _ in range(10):
        op = rng.random()
        w = rng.choice(writers)
        if op < 0.55:  # plain append (sometimes with an injected CAS loss)
            rows, bid = fresh_rows(), next_batch
            next_batch += 1
            batches[bid] = rows
            if rng.random() < 0.4:
                rival = rng.choice([x for x in writers if x is not w])
                r_rows, r_bid = fresh_rows(), next_batch
                next_batch += 1
                batches[r_bid] = r_rows
                _inject_race(w, lambda rr=r_rows, rb=r_bid, rv=rival:
                             commit(rv, rb, rr) and apply_to_model(rr, rb))
            assert commit(w, bid, rows)
            apply_to_model(rows, bid)
        elif op < 0.7 and committed:  # duplicate redelivery of an old batch
            bid = rng.choice(sorted(committed))
            assert commit(w, bid, batches[bid]) is False  # exactly-once
        elif op < 0.9:  # compaction, possibly raced
            if rng.random() < 0.5 and committed:
                rival = rng.choice([x for x in writers if x is not w])
                r_rows, r_bid = fresh_rows(), next_batch
                next_batch += 1
                batches[r_bid] = r_rows
                _inject_race(w, lambda rr=r_rows, rb=r_bid, rv=rival:
                             commit(rv, rb, rr) and apply_to_model(rr, rb))
                try:
                    w.compact(spark)
                except ConcurrentWriteConflict:
                    pass  # refused, nothing changed — model unaffected
            else:
                w.compact(spark)
        else:
            w.vacuum(keep_versions=2)
        live = {r["repo"]: (r["seq_no"], ) for r in
                _tab(tmpdir_path).read_live(spark).collect()} if committed else {}
        want = {k: (s,) for k, (s, o) in model.items() if o != "D"}
        assert live == want, f"seed {seed}: live {live} != model {want}"
        t = _tab(tmpdir_path)
        assert t.committed_batches() == committed
        if committed:
            assert t.watermark() == max(s for s, _ in model.values())


def test_change_feed_stays_linear_across_raced_commits(spark, tmpdir_path):
    """Downstream consumers tail the change feed by version — raced
    commits must still produce a LINEAR feed that contains every commit
    exactly once, attributed to the version that actually won its slot."""
    t1, t2 = _tab(tmpdir_path), _tab(tmpdir_path)
    t1.commit_delta(_df(spark, [("r0", "p0", 1, "U")]), 0, [0, 1, 2, 3], 1)
    _inject_race(t2, lambda: t1.commit_delta(
        _df(spark, [("r1", "p1", 2, "U")]), 1, [0, 1, 2, 3], 2))
    t2.commit_delta(_df(spark, [("r2", "p2", 3, "D")]), 2, [0, 1, 2, 3], 3)
    feed = _tab(tmpdir_path).read_changes(spark, since_version=-1)
    got = {(r["repo"], r["_commit_version"], r["_commit_batch_id"], r["op"])
           for r in feed.collect()}
    assert got == {("r0", 0, 0, "U"), ("r1", 1, 1, "U"), ("r2", 2, 2, "D")}


def test_duplicate_race_losers_files_are_fsck_orphans(spark, tmpdir_path):
    """The duplicate-batch loser staged real parquet that no manifest will
    ever reference (its publish collapsed to a no-op). fsck must report
    exactly those files and reclaim them without touching the winner's
    live data — the cleanup story that completes the concurrent contract."""
    t1, t2 = _tab(tmpdir_path), _tab(tmpdir_path)
    _inject_race(t2, lambda: t1.commit_delta(
        _df(spark, [("r1", "p1", 1, "U")]), 0, [0, 1, 2, 3], 1))
    assert t2.commit_delta(
        _df(spark, [("r1", "p1", 1, "U")]), 0, [0, 1, 2, 3], 1) is False
    rep = t2.fsck()
    assert rep["orphan_files"], rep  # the loser's staged parquet
    assert all(f"-{t2._writer_token[:8]}/" in f for f in rep["orphan_files"]), rep
    t2.fsck(remove=True)
    assert _tab(tmpdir_path).fsck()["orphan_files"] == []
    assert _tab(tmpdir_path).read_live(spark).count() == 1  # winner intact
