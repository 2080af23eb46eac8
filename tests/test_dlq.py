"""Dead-letter queue: structurally invalid events (null key, null seq_no,
unknown op) are quarantined with full payload instead of reaching the LWW
kernel — the badRecordsPath / Kafka-Connect DLQ pattern. Opt-in
(``CDCRunner(dlq=True)`` / ``replay --dlq``); default-off keeps the hot
path's action count unchanged.

The sharp corner pinned here is ANSI three-valued logic: a NULL op makes
the validity predicate NULL, and a naive ``filter(~cond)`` drops the row
from BOTH the apply side and the quarantine side — silent data loss, the
exact failure the DLQ exists to prevent.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from omop_meds_spark.runner import CDCRunner
from omop_meds_spark.sources.gen import generate_wal, replay_oracle


def _inject_malformed(wal_dir: str) -> None:
    """Append one WAL segment mixing 3 invalid rows with 1 valid row (the
    valid row must still apply — quarantine is per-ROW, not per-file)."""
    seq = 10_000_000  # far past the generated WAL's seq range
    rows = {
        "seq_no":   [seq + 1, seq + 2, None,     seq + 4],
        "event_id": ["bad-1", "bad-2", "bad-3",  "good-4"],
        "op":       ["U",     "X",     "U",      "U"],      # bad-2: unknown op
        "repo":     [None,    "r0",    "r0",     "r0"],     # bad-1: null key
        "path":     ["p0",    "p0",    "p0",     "p_dlq"],  # bad-3: null seq
        "commit":   ["c"] * 4,
        "lang":     ["py"] * 4,
        "content":  ["x"] * 4,
    }
    out = sorted(Path(wal_dir).glob("*.parquet"))[-1]
    nxt = int(out.stem) + 1
    pq.write_table(pa.table(rows), Path(wal_dir) / f"{nxt:06d}.parquet")


def test_dlq_quarantines_invalid_rows_exactly(spark, tmpdir_path):
    import shutil

    wal = f"{tmpdir_path}/wal"
    generate_wal(wal, n_events=2000, n_repos=4, paths_per_repo=6, n_files=3,
                 seed=7)
    # oracle input = the pristine WAL: quarantined rows must act as if they
    # never arrived (bad-2 targets a LIVE key — letting it through would
    # displace that key's legitimate winner)
    shutil.copytree(wal, f"{tmpdir_path}/wal_orig")
    _inject_malformed(wal)

    r = CDCRunner(spark, wal, f"{tmpdir_path}/tbl", n_buckets=8,
                  files_per_batch=2, dlq=True)
    metrics = r.run()

    # exactly the 3 invalid rows are quarantined, full payload intact
    dlq = r.read_dlq(spark)
    got = {(row["event_id"], row["op"], row["repo"]) for row in dlq.collect()}
    assert got == {("bad-1", "U", None), ("bad-2", "X", "r0"),
                   ("bad-3", "U", "r0")}

    # the valid row in the same file applied; no invalid key reached state
    state = r.final_state()
    winner = state.filter(state.path == "p_dlq").collect()
    assert len(winner) == 1 and winner[0]["event_id"] == "good-4"
    assert state.filter(state.repo.isNull()).count() == 0

    # the rest of the table is BIT-IDENTICAL to the pandas replay oracle
    # over the pristine WAL (the injected valid row aside)
    from omop_meds_spark import verify

    cols = ["repo", "path", "commit", "lang", "content_sha256", "seq_no"]
    want = replay_oracle(f"{tmpdir_path}/wal_orig")
    have = state.filter(state.path != "p_dlq")
    assert (verify.state_fingerprint(have, cols)
            == verify.pandas_fingerprint(want, cols))

    # quarantine counts surface in metrics and commit lineage
    assert sum(m.get("quarantined", 0) for m in metrics) == 3
    lin = [v for v in r.table.lineage_log().values()
           if isinstance(v, dict) and v.get("dlq_rows")]
    assert lin and lin[0]["dlq_rows"] == 3

    # resume is still exactly-once: nothing re-applies, DLQ unchanged
    r2 = CDCRunner(spark, wal, f"{tmpdir_path}/tbl", n_buckets=8,
                   files_per_batch=2, dlq=True)
    assert r2.run() == []
    assert r2.read_dlq(spark).count() == 3


def test_dlq_off_and_clean_wal_leave_no_dlq_dir(spark, tmpdir_path):
    wal = f"{tmpdir_path}/wal"
    generate_wal(wal, n_events=500, n_repos=3, paths_per_repo=4, n_files=2,
                 seed=9)
    r = CDCRunner(spark, wal, f"{tmpdir_path}/tbl", n_buckets=4,
                  files_per_batch=2, dlq=True)
    r.run()
    # clean WAL: zero-reject batches leave no b* dirs behind
    assert r.read_dlq(spark) is None
    assert not list(Path(f"{tmpdir_path}/tbl/dlq").glob("b*"))


def test_constraints_route_violations_to_dlq_with_reason(spark, tmpdir_path):
    """Semantic CHECK constraints (SQL predicates over the aligned schema)
    quarantine violators — including NULL-predicate rows — with the first
    failing check recorded in _reject_reason; the surviving rows apply
    exactly as if the violators never arrived."""
    import shutil

    wal = f"{tmpdir_path}/wal"
    generate_wal(wal, n_events=2000, n_repos=4, paths_per_repo=6, n_files=3,
                 seed=11)
    shutil.copytree(wal, f"{tmpdir_path}/wal_orig")
    # inject rows that are structurally FINE but semantically bad: an empty
    # lang and a content/lang mismatch the constraint below catches, plus
    # one structural reject to check reason precedence
    seq = 20_000_000
    rows = {
        "seq_no":   [seq + 1, seq + 2, seq + 3],
        "event_id": ["sem-1", "sem-2", "bad-s"],
        "op":       ["U",     "U",     "X"],
        "repo":     ["r0",    "r0",    "r0"],
        "path":     ["p_sem1", "p_sem2", "p_sem3"],
        "commit":   ["c"] * 3,
        "lang":     ["",      None,    "py"],   # sem-2: NULL predicate row
        "content":  ["x"] * 3,
    }
    out = sorted(Path(wal).glob("*.parquet"))[-1]
    pq.write_table(pa.table(rows), Path(wal) / f"{int(out.stem) + 1:06d}.parquet")

    # upserts must carry a non-empty lang; coalesce-free on purpose for
    # sem-2: length(NULL) is NULL -> three-valued logic -> quarantined
    r = CDCRunner(spark, wal, f"{tmpdir_path}/tbl", n_buckets=8,
                  files_per_batch=2,
                  constraints=["op <> 'U' OR length(lang) > 0"])
    r.run()

    dlq = r.read_dlq(spark)
    got = {row["event_id"]: row["_reject_reason"] for row in dlq.collect()}
    assert got == {
        "sem-1": "constraint: op <> 'U' OR length(lang) > 0",
        "sem-2": "constraint: op <> 'U' OR length(lang) > 0",
        "bad-s": "structural",
    }
    # applied state == replay of the pristine WAL (EVERY injected row in
    # this test quarantined, so no exclusion filter needed)
    from omop_meds_spark.verify import pandas_fingerprint, state_fingerprint

    cols = ["repo", "path", "commit", "lang", "seq_no"]
    pdf = replay_oracle(f"{tmpdir_path}/wal_orig")
    assert state_fingerprint(r.final_state().select(*cols), cols) == \
        pandas_fingerprint(pdf[cols], cols)
    # the CLI inspection surface aggregates by reason
    from omop_meds_spark.__main__ import main

    assert main(["dlq", "--table", f"{tmpdir_path}/tbl", "--cores", "8"]) == 0


def test_streaming_dlq_matches_batch_dlq(spark, tmpdir_path):
    """The streaming runner quarantines the SAME rows through the shared
    kernel and its applied state matches a pristine-WAL replay —
    batch/streaming DLQ parity."""
    import shutil

    from omop_meds_spark.runner import read_dlq_dir
    from omop_meds_spark.streaming.stream_runner import StreamingCDCRunner

    wal = f"{tmpdir_path}/wal"
    generate_wal(wal, n_events=2000, n_repos=4, paths_per_repo=6, n_files=3,
                 seed=7)
    shutil.copytree(wal, f"{tmpdir_path}/wal_orig")
    _inject_malformed(wal)

    r = StreamingCDCRunner(spark, wal, f"{tmpdir_path}/tbl", n_buckets=8,
                           files_per_batch=2, dlq=True)
    r.run_available()
    dlq = read_dlq_dir(spark, r.dlq_root)
    got = {(row["event_id"], row["_reject_reason"]) for row in dlq.collect()}
    assert got == {("bad-1", "structural"), ("bad-2", "structural"),
                   ("bad-3", "structural")}
    from omop_meds_spark.verify import pandas_fingerprint, state_fingerprint

    # rest of the table == pristine-WAL oracle (the injected VALID row in
    # the malformed segment applied, like the batch test asserts)
    state = r.final_state()
    assert state.filter(state.path == "p_dlq").count() == 1
    cols = ["repo", "path", "commit", "lang", "seq_no"]
    pdf = replay_oracle(f"{tmpdir_path}/wal_orig")
    assert state_fingerprint(
        state.filter(state.path != "p_dlq").select(*cols), cols) == \
        pandas_fingerprint(pdf[cols], cols)
