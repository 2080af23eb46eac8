#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs per-round):

1. times the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
   ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32),
2. runs the full CDC WAL replay (the engine's actual workload) at TWO
   parallelism levels — local[8] and local[32] — in separate child
   processes on the SAME deterministic WAL, and reports events/sec at both
   plus the N→4N scaling efficiency (the sandbox stand-in for a 2-cluster-
   size run, per BASELINE.json's north rule),
3. prints ONE JSON line with everything.

Child mode (``--cdc-worker``) replays a WAL once at a given core count and
prints its own JSON line; the parent aggregates.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# deterministic bench WAL (cached across runs — generation is seeded)
WAL_EVENTS = int(os.environ.get("BENCH_WAL_EVENTS", "1500000"))
WAL_CACHE = REPO / ".bench_cache" / f"wal_{WAL_EVENTS}"

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "cdc_apply_events",
    "dedup_earliest",
    "sessionize",
    "minhash_lsh_pairs",
    "text_features",
    "embedding_topk",
]


def _ensure_wal() -> Path:
    from omop_meds_spark.sources.gen import generate_wal

    marker = WAL_CACHE / "_wal_manifest.json"
    if not marker.exists():
        WAL_CACHE.mkdir(parents=True, exist_ok=True)
        generate_wal(
            WAL_CACHE,
            n_events=WAL_EVENTS,
            n_repos=200,
            paths_per_repo=500,
            n_files=24,
            seed=42,
        )
    return WAL_CACHE


def run_queries() -> dict[str, float]:
    """Time each headline query end-to-end (noop sink = full execution,
    zero collect cost)."""
    from omop_meds_spark.queries import ALL_QUERIES
    from omop_meds_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS, shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = ALL_QUERIES[name]
        df = fn(spark, SF_DIR)  # warm-up: plan + first run (JIT, file listing)
        df.write.format("noop").mode("overwrite").save()
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return timings


def cdc_worker(wal: str, table: str, cores: int) -> dict:
    """Replay the whole WAL once; return wall time + throughput."""
    import shutil

    from omop_meds_spark.runner import CDCRunner
    from omop_meds_spark.session import get_spark

    shutil.rmtree(table, ignore_errors=True)
    spark = get_spark(app_name=f"cdc-bench-{cores}", cores=cores, shuffle_partitions=cores)
    runner = CDCRunner(spark, wal, table, n_buckets=cores, files_per_batch=8)
    t0 = time.monotonic()
    metrics = runner.run()
    wall = time.monotonic() - t0
    n_events = sum(m["n_events"] for m in metrics)
    n_keys = runner.final_state().count()
    spark.stop()
    shutil.rmtree(table, ignore_errors=True)
    return {
        "cores": cores,
        "wall_s": round(wall, 3),
        "n_events": n_events,
        "events_per_s": round(n_events / wall, 1),
        "n_batches": len(metrics),
        "final_keys": n_keys,
    }


def run_scaling(wal: Path) -> dict:
    """Same WAL at local[8] and local[32] in fresh processes (fresh JVMs —
    no shared cache), N vs 4N parallelism."""
    out = {}
    for cores in (8, 32):
        table = str(REPO / ".bench_cache" / f"table_c{cores}")
        proc = subprocess.run(
            [sys.executable, __file__, "--cdc-worker", "--wal", str(wal),
             "--table", table, "--cores", str(cores)],
            capture_output=True, text=True, timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        out[f"local[{cores}]"] = json.loads(line)
    t8 = out["local[8]"]["events_per_s"]
    t32 = out["local[32]"]["events_per_s"]
    out["scaling_efficiency_8_to_32"] = round((t32 / t8) / 4.0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cdc-worker", action="store_true")
    ap.add_argument("--wal")
    ap.add_argument("--table")
    ap.add_argument("--cores", type=int, default=CPUS)
    ap.add_argument("--no-scaling", action="store_true",
                    help="skip the two-parallelism CDC replay")
    args = ap.parse_args()

    if args.cdc_worker:
        print(json.dumps(cdc_worker(args.wal, args.table, args.cores)))
        return

    queries = run_queries()
    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": f"headline suite wall time (sum) at sf{sf_label}",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
    }
    if not args.no_scaling:
        wal = _ensure_wal()
        scaling = run_scaling(wal)
        result["cdc_replay"] = scaling
        result["cdc_events_per_sec"] = scaling["local[32]"]["events_per_s"]
        result["scaling_efficiency"] = scaling["scaling_efficiency_8_to_32"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
