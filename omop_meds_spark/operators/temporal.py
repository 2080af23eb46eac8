"""Temporal joins: point-in-time (as-of) enrichment.

The CDC-native operator Spark lacks as a built-in: for each left row at
time t, attach the LATEST right row with time' <= t for the same key (how
a change stream is joined to a slowly-changing dimension without leaking
future values). The reference's person/death/care-site enrichments are
degenerate as-of joins (dimension frozen at extract time); a continuous
pipeline needs the general form.

Spark-first shape — the union + carry-forward window, not a range join:

* tag both sides, union them (``unionByName(allowMissingColumns=True)``
  nulls the other side's payload),
* ONE window pass per key ordered by (time, side) — right rows sort
  before left rows at equal times, so "as of" includes ties — carrying
  the last non-null right payload forward,
* keep left rows, unpack the carried payload.

Cost: one hash exchange on the key + one in-partition sort — linear, no
candidate explosion, no per-row subquery; identical to how kdb/Flink
execute as-of at scale. A broadcast variant is pointless here because the
window already co-locates by key; skewed keys behave like any windowed
aggregation (AQE handles the join-free plan's exchange).

Exact DuckDB oracle: ``ASOF LEFT JOIN`` (oracles.py ``asof_join_latest``).

Determinism contract: the right side must be unique per (key, time) —
pre-aggregate if necessary — otherwise "the" latest row at a tied time is
undefined in every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Left as-of join: all left columns + the right side's value columns
    (and ``right_time``) from the latest right row with
    ``right_time <= left_time`` per key; nulls when no such row."""
    rvals = [c for c in right.columns if c not in key_cols]
    lpart = left.select(
        *key_cols,
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rpart = right.select(
        *key_cols,
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rvals]).alias("__r"),
    )
    u = lpart.unionByName(rpart, allowMissingColumns=True)
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    out_left = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__c.{c}").alias(c) for c in rvals]
    return (
        u.withColumn("__c", carried)
        .filter(F.col("__side") == 1)
        .select(*out_left, *out_right)
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    key_cols: list[str] | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Range join: pair each event with every interval containing it
    (half-open ``start <= t < end``), optionally also keyed on equality
    columns.

    Spark-first shape — the BINNED equi-join, not a theta join: a naive
    ``l.t >= r.s AND l.t < r.e`` condition compiles to
    BroadcastNestedLoopJoin (O(|L|·|R|), a scale-killer). Instead both
    sides map onto fixed-width time bins: an event has exactly ONE bin, an
    interval explodes into the bins it covers (bounded by
    length/bin_seconds), and the join is a plain hash equi-join on
    (key, bin) followed by the exact containment filter. Each matching
    pair meets in exactly one bin (the event's), so no dedup pass is
    needed. Pick ``bin_seconds`` near the typical interval length: the
    explode factor stays O(1) and the plan is one keyed shuffle each side.

    Empty/inverted intervals (end <= start) are dropped (half-open
    semantics — they can contain nothing).
    """
    keys = list(key_cols or [])
    w = F.lit(bin_seconds * 1_000_000).cast("long")
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    lpart = events.withColumn("__bin", F.floor(t_us / w))
    rpart = (
        intervals.filter(e_us > s_us)
        .withColumn("__bin", F.explode(F.sequence(F.floor(s_us / w), F.floor((e_us - 1) / w))))
    )
    joined = lpart.join(rpart, keys + ["__bin"])
    t_j = F.unix_micros(F.col(time_col).cast("timestamp"))
    s_j = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_j = F.unix_micros(F.col(end_col).cast("timestamp"))
    return joined.filter((t_j >= s_j) & (t_j < e_j)).drop("__bin")
