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
    DoubleType,
    LongType,
    StructField,
    StructType,
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
