#!/usr/bin/env python
"""Stage-level profile of one CDC micro-batch apply.

Times the driver-side phases of ``CDCRunner.apply_batch`` at a given core
count (default 4) on the cached bench WAL, separating plan construction
(pure driver/py4j/Catalyst cost — serial, does not scale with cores) from
job execution and commit bookkeeping. This is the measurement tool behind
the N->4N scaling-margin work: efficiency = (S+P)/(4S+P) where S is the
serial component this script itemizes.

Usage: python scripts/profile_batch.py [cores] [n_trials]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from omop_meds_spark.runner import CDCRunner, merge_commit_target  # noqa: E402
from omop_meds_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    wal = bench._shm_wal(bench._ensure_wal())
    import shutil

    spark = get_spark(app_name=f"profile-{cores}", cores=cores,
                      shuffle_partitions=64,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-scratch"})

    root = "/dev/shm/profile_tbl"
    shutil.rmtree(root, ignore_errors=True)
    warm = CDCRunner(spark, wal, f"{root}/warm", n_buckets=32,
                     files_per_batch=bench.FILES_PER_BATCH)
    batches = warm.reader.plan_batches()
    warm.apply_batch(batches[0])  # JVM/codegen warmup
    warm.apply_batch(batches[1])
    trial_batch = batches[1]

    for trial in range(trials):
        shutil.rmtree(f"{root}/trial", ignore_errors=True)
        r = CDCRunner(spark, wal, f"{root}/trial", n_buckets=32,
                      files_per_batch=bench.FILES_PER_BATCH)
        stages: dict[str, float] = {}

        def tick(name, t0, stages=stages):
            t1 = time.monotonic()
            stages[name] = stages.get(name, 0.0) + (t1 - t0)
            return t1

        aqe_key = "spark.sql.adaptive.enabled"
        spark.conf.set(aqe_key, "false")
        winners = None
        try:
            wall0 = time.monotonic()
            t0 = wall0
            r.table.is_committed(trial_batch.batch_id)
            r.meds_table.is_committed(trial_batch.batch_id)
            t0 = tick("a_is_committed", t0)
            events = r.reader.read_batch(spark, trial_batch, r.registry)
            t0 = tick("b_read_batch_plan", t0)
            from omop_meds_spark.operators.upsert import last_writer_wins
            from omop_meds_spark.schemas import KEY_COLS

            lww = r.table.prepartition_delta(
                last_writer_wins(events, KEY_COLS, n_salts=r.n_salts,
                                 salted=r.salted))
            winners = r.normalize(lww).persist()
            t0 = tick("c_transform_plan+persist_call", t0)
            from concurrent.futures import ThreadPoolExecutor

            from omop_meds_spark.operators.meds import change_winners_to_meds

            lineage = {"files": list(trial_batch.files),
                       "schema_version": r.registry.version}
            commit_times: dict[str, dict[str, float]] = {}

            def timed_commit(tag, table, delta, prepart):
                tt = {}
                s0 = time.monotonic()
                # mirror runner._apply_batch_inner exactly, incl. the meds
                # lineage target tag — the profile must measure the real shape
                lin = lineage if tag == "state" else {**lineage, "target": "meds"}
                st = merge_commit_target(spark, table, delta,
                                         trial_batch.batch_id, lin,
                                         r.registry.schema_json() if tag == "state" else None,
                                         prepart)
                tt["total"] = time.monotonic() - s0
                commit_times[tag] = tt
                return st

            with ThreadPoolExecutor(2) as pool:
                f_state = pool.submit(timed_commit, "state", r.table, winners, True)
                f_meds = pool.submit(timed_commit, "meds", r.meds_table,
                                     change_winners_to_meds(winners), False)
                stats = f_state.result()
                f_meds.result()
            t0 = tick("d_two_commits_concurrent", t0)
            n_events = r.reader.footer_rows(trial_batch)
            t0 = tick("e_footer_rows", t0)
            for tb in (r.table, r.meds_table):
                hot = tb.hot_buckets(r.compact_every)
                if hot:
                    tb.compact(spark, buckets=hot)
            t0 = tick("f_hot_buckets+compact", t0)
            winners.unpersist()
            t0 = tick("g_unpersist", t0)
            winners = None  # the finally must not double-unpersist
            total = time.monotonic() - wall0
            print(f"--- trial {trial} cores={cores} total={total:.3f}s "
                  f"n_events={n_events} n_keys={stats['n_keys']}")
            for k in sorted(stages):
                if k.startswith(("a_", "b_", "c_", "d_", "e_", "f_", "g_")):
                    print(f"  {k:36s} {stages[k]:7.3f}s")
            for tag, tt in commit_times.items():
                print(f"  commit[{tag}] total                  {tt['total']:7.3f}s")
        finally:
            if winners is not None:
                winners.unpersist()
            spark.conf.set(aqe_key, "true")
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
