"""Custom stateful streaming operator: per-key running totals via
``applyInPandasWithState``.

The assignment's streaming surface includes arbitrary user state beyond
windowed aggregation (``applyInPandasWithState`` is the Spark mechanism —
Arrow-batched, grouped, with an explicit GroupState handle). This module
implements the canonical CDC-side example: per-key cumulative event
totals that survive across micro-batches, with every reducer chosen to be
ORDER-FREE (count / max) so the result is independent of batch
composition and partitioning — the same determinism discipline as the
LWW kernel. The batch twin (one groupBy over the full input) is the
correctness oracle in tests/test_stateful_streaming.py.

Scale notes: state is per-key and O(1) per key (two numbers), sharded by
the stream's groupBy hash partitioning; Arrow batches stream through
Python with bounded memory. Timeouts (GroupStateTimeout) would evict idle
keys in a production deployment; the bounded test WAL doesn't need them.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("mx", DoubleType())]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mx = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            batch_max = float(pdf["value"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
    )


def stateful_event_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming DataFrame of per-key running (count, max(value)) — one
    updated row per key per micro-batch the key appears in. Works on a
    batch DataFrame's grouped twin too, but the point is the streaming
    state handle."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_funnel_state_op(
    steps: list[str],
    key_col: str = "user_id",
    key_type=None,
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Factory for a STREAMING ordered-funnel operator over
    ``applyInPandasWithState`` — the stateful twin of
    ``operators.temporal.funnel_match`` (same strict-order semantics:
    t1 = min ts of step 1, t_{k+1} = min ts of step k+1 with ts > t_k).

    Out-of-order robustness by design: per-user state is the SORTED
    timestamp list per step (not the folded step times), and the funnel is
    recomputed from those lists on every update — so a late-arriving
    EARLIER event (e.g. the true first 'view' landing two micro-batches
    after a 'click') retracts and corrects the conversion, where a
    monotone fold would silently keep the stale answer. This is the
    standard trade: exact funnel semantics under unordered streams require
    state O(per-user funnel-type events); production deployments bound it
    with a watermark/TTL eviction (GroupStateTimeout), which the bounded
    test streams don't need.

    Returns (update_fn, output_schema, state_schema); per-user emitted row
    carries the current step times, a ``converted`` flag, and the monotone
    ``n_seen`` counter (the per-key latest-row selector for update-mode
    sinks).
    """
    import bisect

    k = len(steps)
    out_schema = StructType(
        [StructField(key_col, key_type if key_type is not None else LongType())]
        + [StructField(f"step{i + 1}_ts", TimestampType()) for i in range(k)]
        + [StructField("converted", BooleanType()),
           StructField("n_seen", LongType())]
    )
    state_schema = StructType(
        [StructField(f"s{i}", ArrayType(LongType())) for i in range(k)]
        + [StructField("n", LongType())]
    )

    def _update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            got = state.get
            lists = [list(got[i]) for i in range(k)]
            n_seen = int(got[k])
        else:
            lists, n_seen = [[] for _ in range(k)], 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_seen += len(pdf)
            ns = pdf[ts_col].astype("int64")
            et = pdf[type_col]
            for i, st in enumerate(steps):
                new = ns[et == st]
                if len(new):
                    lists[i].extend(int(x) for x in new)
                    lists[i].sort()
        state.update(tuple(lists) + (n_seen,))
        times: list[int | None] = []
        prev: int | None = None
        for i in range(k):
            arr = lists[i]
            if i == 0:
                cur = arr[0] if arr else None
            elif prev is None:
                cur = None
            else:
                j = bisect.bisect_right(arr, prev)
                cur = arr[j] if j < len(arr) else None
            times.append(cur)
            prev = cur
        row: dict[str, list] = {key_col: [key[0]]}
        for i in range(k):
            row[f"step{i + 1}_ts"] = [
                pd.Timestamp(times[i]) if times[i] is not None else pd.NaT
            ]
        row["converted"] = [times[-1] is not None]
        row["n_seen"] = [n_seen]
        yield pd.DataFrame(row)

    return _update, out_schema, state_schema


def stateful_funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming ordered-funnel conversion per key — see
    ``make_funnel_state_op``. The key/ts/type columns are parameterized
    like the batch twin's, with the key field's TYPE taken from the input
    schema so a string or int key emits through the right Arrow type. The
    pushed step filter keeps non-funnel events out of the Python worker
    entirely."""
    update_fn, out_schema, state_schema = make_funnel_state_op(
        steps, key_col=key_col,
        key_type=events.schema[key_col].dataType,
        ts_col=ts_col, type_col=type_col,
    )
    from pyspark.sql import functions as F

    return (
        events.filter(F.col(type_col).isin(*steps))
        .groupBy(key_col)
        .applyInPandasWithState(
            update_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
