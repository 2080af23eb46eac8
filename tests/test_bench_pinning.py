"""Executor-faithful CPU pinning helpers in bench.py.

The scaling protocol's workers pin their JVMs to disjoint cpusets sized
exactly to their core count (an unpinned local[1] JVM measurably consumes
~1.1 cores — its GC/netty threads ride idle cores a real cgroup-bound
executor does not have, deflating the measured N→4N ratio). These tests
pin the spec computation and the affinity application without Spark.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_pair_envs_disjoint_and_sized(monkeypatch):
    monkeypatch.setattr(bench, "SCALE_PAIR", (1, 4))
    envs = bench._pair_envs()
    assert envs[1]["BENCH_CPUSET"] == "0"
    assert envs[4]["BENCH_CPUSET"] == "1-4"
    monkeypatch.setattr(bench, "SCALE_PAIR", (2, 8))
    envs = bench._pair_envs()
    assert envs[2]["BENCH_CPUSET"] == "0-1"
    assert envs[8]["BENCH_CPUSET"] == "2-9"


def test_pinning_disabled_by_env(monkeypatch):
    monkeypatch.setenv("BENCH_PIN_CPUS", "0")
    envs = bench._pair_envs()
    assert all("BENCH_CPUSET" not in e for e in envs.values())


def test_pin_self_applies_affinity(monkeypatch):
    before = os.sched_getaffinity(0)
    try:
        monkeypatch.setenv("BENCH_CPUSET", "0-1")
        assert bench._pin_self_from_env() == "0-1"
        assert os.sched_getaffinity(0) == {0, 1}
        monkeypatch.setenv("BENCH_CPUSET", "0,2")
        assert bench._pin_self_from_env() == "0,2"
        assert os.sched_getaffinity(0) == {0, 2}
    finally:
        os.sched_setaffinity(0, before)


def test_pin_self_noop_without_env(monkeypatch):
    monkeypatch.delenv("BENCH_CPUSET", raising=False)
    before = os.sched_getaffinity(0)
    assert bench._pin_self_from_env() is None
    assert os.sched_getaffinity(0) == before


def _bloated_result() -> dict:
    """A result shaped like a worst-case full capture: 82-query map plus
    controlled + full_replay + retry blocks with all raw arrays."""
    import json as _json
    queries = {f"query_name_number_{i:02d}": 12.345 for i in range(82)}
    block = {
        "protocol": "x" * 600,
        "pair": {"N": 1, "4N": 4},
        "replays_per_side": 8,
        "ratio_rows": [
            {"batch_index": i % 4, "lo_wall_s": 20.0, "hi_wall_s": 6.0,
             "efficiency": 0.83, "steady": True} for i in range(16)
        ],
        "pair_efficiencies": [0.8] * 12,
        "pair_efficiencies_valid": [0.8] * 11,
        "clean_gate": 1.25,
        "floors": {"lo_steady_wall_floor_s": 18.0,
                   "hi_steady_wall_floor_s": 5.6,
                   "floor_ratio_efficiency": 0.859},
        "scaling_efficiency": 0.859,
        "scaling_efficiency_pair_median": 0.847,
        "local[1]": {"steady_events_per_s_median": 207768.0,
                     "steady_events_per_s_best": 215828.2},
        "local[4]": {"steady_events_per_s_median": 690102.5,
                     "steady_events_per_s_best": 741612.1},
        "clock_probe": {"probe_ms_lo_windows": 77.4,
                        "probe_ms_hi_windows": 78.2,
                        "clock_ratio_hi_over_lo": 1.01},
    }
    result = {
        "metric": "headline suite wall time (sum) at sf0.1",
        "value": 18.345,
        "unit": "sec",
        "queries": queries,
        "sf": "0.1",
        "cdc_replay": {"controlled": _json.loads(_json.dumps(block)),
                       "full_replay": _json.loads(_json.dumps(block)),
                       "full_replay_retry": _json.loads(_json.dumps(block))},
        "cdc_events_per_sec": 741612.1,
        "scaling_efficiency_controlled": 0.858,
        "scaling_efficiency_best": 0.883,
        "scaling_efficiency_full_replay": 0.859,
        "scaling_efficiency": 0.859,
    }
    return result


def test_fit_tail_line_under_budget_worst_case():
    import json as _json
    line = bench.fit_tail_line(_bloated_result())
    assert len(line) <= bench.TAIL_BUDGET
    parsed = _json.loads(line)
    # headline scalars must survive every slimming step
    for k in ("metric", "value", "unit", "queries", "sf",
              "scaling_efficiency", "cdc_events_per_sec"):
        assert k in parsed, k
    assert parsed["scaling_efficiency"] == 0.859


def test_fit_tail_line_small_result_untouched():
    import json as _json
    small = {"metric": "m", "value": 1.0, "unit": "sec",
             "queries": {"q1": 0.5}, "sf": "0.1",
             "scaling_efficiency": 0.9}
    line = bench.fit_tail_line(small)
    assert _json.loads(line) == small


def test_fit_tail_line_headline_queries_fit_without_truncation():
    """The real stdout line carries only the HEADLINE subset — after the
    replay-tree slimming steps it must fit WITHOUT halving the map."""
    import json as _json
    r = _bloated_result()
    r["queries"] = {name: 1.234 for name in bench.HEADLINE}
    parsed = _json.loads(bench.fit_tail_line(r))
    assert "queries_truncated_see" not in parsed
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_retry_trigger_fires_on_dirty_full_replay_block():
    # the observed case: controlled cleared (0.824) but full replay caught
    # a dirty window (0.779) — must re-sample
    assert bench.should_retry_full([0.824, 0.779], [0.779])
    # both blocks under the gate — the original rule
    assert bench.should_retry_full([0.81, 0.779], [0.779])
    # full replay clean — no retry regardless of controlled
    assert not bench.should_retry_full([0.77, 0.84], [0.84])
    # no blocks at all — nothing to retry
    assert not bench.should_retry_full([], [])
    # controlled-only capture that cleared: no full block to re-sample
    assert not bench.should_retry_full([0.86], [])


def test_fit_tail_line_survives_controlled_retry_block():
    """Round 5 adds a symmetric controlled-block retry; a capture carrying
    FOUR replay blocks (controlled + its retry + full + its retry) must
    still slim under the driver's tail cap with headline scalars intact."""
    import json as _json

    r = _bloated_result()
    r["cdc_replay"]["controlled_retry"] = _json.loads(
        _json.dumps(r["cdc_replay"]["controlled"]))
    r["cdc_replay"]["controlled_retry"]["trials"] = [
        {"cores": 1, "wall_s": 30.0, "n_events": 6000000,
         "events_per_s": 200000.0} for _ in range(14)
    ]
    line = bench.fit_tail_line(r)
    assert len(line) <= bench.TAIL_BUDGET
    parsed = _json.loads(line)
    for k in ("metric", "value", "unit", "queries",
              "scaling_efficiency", "scaling_efficiency_controlled"):
        assert k in parsed, k
