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
