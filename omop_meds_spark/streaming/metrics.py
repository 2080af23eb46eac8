"""Streaming throughput metrics: watermarked tumbling-window aggregation.

SURVEY T6: the engine's only windowed streaming need is throughput/lineage
metrics — tumbling windows over the WAL's event time with a watermark to
bound state. This is the genuine Structured Streaming watermark/window API
(append mode emits a window only once the watermark passes its end — i.e.
finalized, late-data-tolerant counts); the batch twin of the same
aggregation is ``queries.windowed_event_counts``.

Event time here derives from ``seq_no`` (the binlog position — a monotonic
logical clock); a production deployment would use the source's commit
timestamp column identically. Only never-drifting envelope columns are read,
so a fixed stream schema is safe even across schema evolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STABLE_SCHEMA = T.StructType(
    [
        T.StructField("seq_no", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
    ]
)


def streaming_window_counts(
    spark: SparkSession,
    wal_dir: str,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    files_per_trigger: int = 4,
) -> DataFrame:
    """Build the watermarked windowed-count stream (caller starts it)."""
    stream = (
        spark.readStream.schema(STABLE_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(wal_dir)
    )
    ev = stream.withColumn("event_time", F.timestamp_seconds(F.col("seq_no")))
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("op"))
        .agg(F.count("*").alias("n_events"), F.approx_count_distinct("repo").alias("n_repos"))
        .select(F.col("w.start").alias("window_start"), "op", "n_events", "n_repos")
    )


def run_to_memory(spark: SparkSession, wal_dir: str, name: str = "wal_metrics",
                  timeout_s: float = 300.0, **kwargs) -> DataFrame:
    """Drive the stream with Trigger.AvailableNow into an in-memory sink
    (append mode → only watermark-finalized windows appear)."""
    q = (
        streaming_window_counts(spark, wal_dir, **kwargs)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
    return spark.table(name)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
    max_delay: str = "10 minutes",
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event with
    the right events for the same key arriving in ``[left_time,
    left_time + max_delay]`` — the impression↔click / order↔payment
    correlation operator, as a genuine two-stream join (both sides are
    unbounded; neither fits in a static broadcast).

    Bounded state is the whole design: BOTH sides carry a watermark and
    the join predicate carries an explicit event-time range, which is
    exactly what lets Spark expire buffered rows — a key+time-bounded
    join needs only ``O(events per watermark+delay window)`` state per
    side, while a stream-stream join without the time bound must buffer
    each side forever (the unbounded-state trap). ``how='left_outer'``
    additionally emits unmatched left rows, but only once the watermark
    passes their join window (the row is provably unmatchable); inner
    rows emit immediately.

    Columns: all left columns + the right side's key-excluded columns
    (caller pre-projects/renames clashes, same contract as asof_join).
    The batch twin — the same predicate as a plain join — is asserted
    equal in tests/test_streaming_metrics.py.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (lw[k] == rw[k])
    cond = cond & (rw[right_time] >= lw[left_time]) & (
        rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {max_delay}")
    )
    rvals = [c for c in right.columns if c not in key_cols]
    out = [lw[c] for c in left.columns] + [rw[c] for c in rvals]
    return lw.join(rw, cond, how).select(*out)


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via Spark's native merging session window:
    per-user sessions close after ``gap`` of inactivity, emitting
    (user, session_start, session_end, n_events) — the unbounded-stream
    form of the batch ``sessionize`` query (a lag/cumsum window there; a
    stateful merging window here, because an infinite stream has no "ORDER
    BY ts" to lag over).

    State is bounded by the watermark: a session's state lives only until
    the watermark passes its end (start of the gap after its last event),
    so memory is O(open sessions), never O(stream history). Append mode
    emits each session exactly once, when it is provably closed — late
    events inside the watermark still extend/merge their session before
    emission (session_window merges overlapping windows), which a naive
    "emit on first gap" fold gets wrong.

    Boundary note vs the batch twin: `session_window` treats an event at
    exactly ``last + gap`` as a NEW session (half-open interval); the
    batch query's `> gap` keeps it. Equal only when no inter-event delta
    is exactly the gap — true of the synthetic WAL and asserted fuzzily in
    the twin test.
    """
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(time_col), gap).alias("s"))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def watermarked_dedup(
    events: DataFrame,
    key_cols: list[str],
    time_col: str = "event_time",
    watermark: str = "30 seconds",
) -> DataFrame:
    """At-least-once → effectively-once pre-dedup for a redelivering
    source: drop duplicate keys whose copies arrive within ``watermark``
    of each other (``dropDuplicatesWithinWatermark`` — Spark keeps each
    key's dedup state only until the watermark passes it, so state is
    O(keys-per-watermark-window), NOT O(stream history — the unbounded
    ``dropDuplicates`` trap on an infinite stream).

    Complements the LWW kernel rather than replacing it: LWW is already
    idempotent under byte-identical redelivery (operators/upsert.py), so
    the CDC hot path does NOT pay this extra stateful stage; it is the
    dial for sources that redeliver aggressively enough to make shuffling
    duplicates wasteful, or for pipelines whose downstream op is not a
    reduction. Exactly the bounded-state semantics a 100 TB stream needs:
    duplicates separated by more than the watermark are the source
    contract's problem, not the operator's.
    """
    return (
        events.withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
