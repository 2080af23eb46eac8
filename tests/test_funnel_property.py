"""Property test: funnel_match vs a pure-Python timeline walk over seeded
random event streams — the same oracle style as the upsert LWW fuzz
(tests/test_upsert_property.py), applied to the funnel fold.

The reference model replays each user's events in (ts, event_id) order and
takes the first qualifying event per step (strict > gate) — exactly the
relational min() chain the DuckDB oracle runs at sf0.01.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from omop_meds_spark.operators.temporal import funnel_match

STEPS = ["A", "B", "C"]
TYPES = ["A", "B", "C", "X"]  # X = noise the pushed filter must drop


def model_funnel(rows: list[tuple]) -> dict[int, tuple]:
    by_user: dict[int, list] = {}
    for user, ts, eid, et in rows:
        by_user.setdefault(user, []).append((ts, eid, et))
    out = {}
    for user, evs in by_user.items():
        t = [None] * len(STEPS)
        for ts, _eid, et in sorted(evs):
            for i, st in enumerate(STEPS):
                if t[i] is None and et == st and (
                        i == 0 or (t[i - 1] is not None and ts > t[i - 1])):
                    t[i] = ts
                    break
        if t[-1] is not None:
            out[user] = tuple(t)
    return out


@pytest.mark.parametrize("seed", range(12))
def test_funnel_matches_model_on_random_streams(spark, seed):
    rng = random.Random(seed)
    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for user in range(25):
        for _ in range(rng.randint(0, 14)):
            # coarse second grid forces plenty of ts ties across types
            ts = t0 + dt.timedelta(seconds=rng.randint(0, 5))
            rows.append((user, ts, eid, rng.choice(TYPES)))
            eid += 1
    if not rows:
        pytest.skip("empty stream")
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {
        r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts)
        for r in funnel_match(ev, STEPS).collect()
    }
    assert got == model_funnel(rows)
