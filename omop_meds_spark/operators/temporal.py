"""Temporal joins: point-in-time (as-of) enrichment and interval containment.

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
execute as-of at scale.

HOT KEYS: a window partitions by the raw key, and AQE does not split a
window partition — one pathologically hot key serializes into one task.
``bucket_seconds`` opts into the time-bucketed pre-partition: the window
key becomes (key, time-bucket), each bucket seeded with the latest right
row from earlier buckets (computed on the tiny per-bucket-winner relation),
so a hot key's timeline fans out across tasks. Bit-identical results to
the plain path (asserted in tests/test_temporal.py), at the cost of two
small extra shuffles — the dial you turn when one key dominates.

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
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + the right side's value columns
    (and ``right_time``) from the latest right row with
    ``right_time <= left_time`` per key; nulls when no such row.

    Right value columns may not collide with left column names (the
    output would carry silent duplicates) — raises ``ValueError``;
    rename or pre-project the right payload. ``bucket_seconds`` enables
    the hot-key time-bucketed plan (see module doc)."""
    rvals = [c for c in right.columns if c not in key_cols]
    clash = sorted(set(left.columns) & set(rvals))
    if clash:
        raise ValueError(
            f"asof_join: right value columns {clash} collide with left "
            "columns — rename or pre-project the right payload"
        )
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
    out_left = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__c.{c}").alias(c) for c in rvals]

    if bucket_seconds is None:
        u = lpart.unionByName(rpart, allowMissingColumns=True)
        w = (
            W.partitionBy(*key_cols)
            .orderBy(F.col("__t"), F.col("__side"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            u.withColumn("__c", F.last("__r", ignorenulls=True).over(w))
            .filter(F.col("__side") == 1)
            .select(*out_left, *out_right)
        )

    # ---- hot-key plan: window key = (key, time bucket), seeded buckets
    b = lambda t: F.floor(F.unix_micros(t) / F.lit(bucket_seconds * 1_000_000))  # noqa: E731
    lpart = lpart.withColumn("__b", b(F.col("__t")))
    rpart = rpart.withColumn("__b", b(F.col("__t")))
    # latest right row per (key, bucket) — the tiny relation the carry runs on
    winners = rpart.groupBy(*key_cols, "__b").agg(
        F.max_by("__r", F.col("__t")).alias("__r"), F.max("__t").alias("__t")
    )
    # every bucket that needs a seed: buckets holding left rows ∪ winner buckets
    buckets = (
        lpart.select(*key_cols, "__b").distinct()
        .unionByName(winners.select(*key_cols, "__b")).distinct()
    )
    carry_w = (
        W.partitionBy(*key_cols).orderBy("__b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # NULL-SAFE attach: the plain plan's window groups NULL keys together
    # and sorts a NULL __t (unparseable right time → NULL bucket) FIRST,
    # carrying its payload forward — a null-unsafe equi-join here would
    # silently drop exactly those winners and break the bit-identical
    # contract with the plain path, so every join term is `<=>`.
    import functools as _ft
    import operator as _op
    wsel = winners.select(
        *[F.col(c).alias(f"__w_{c}") for c in key_cols],
        F.col("__b").alias("__w_b"), "__r", "__t")
    null_safe = _ft.reduce(_op.and_, [
        buckets[c].eqNullSafe(wsel[f"__w_{c}"]) for c in key_cols
    ] + [buckets["__b"].eqNullSafe(wsel["__w_b"])])
    seeds = (
        buckets.join(wsel, null_safe, "left")
        .select(*key_cols, "__b", "__r", "__t")
        .withColumn("__seed", F.last("__r", ignorenulls=True).over(carry_w))
        .withColumn("__seed_t", F.last("__t", ignorenulls=True).over(carry_w))
        .filter(F.col("__seed").isNotNull())
        .select(*key_cols, "__b", F.col("__seed_t").alias("__t"),
                F.lit(0).alias("__side"), F.col("__seed").alias("__r"))
    )
    # seed time is strictly before the bucket start, so it sorts first
    u = lpart.unionByName(rpart, allowMissingColumns=True).unionByName(
        seeds, allowMissingColumns=True
    )
    w = (
        W.partitionBy(*key_cols, "__b")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        u.withColumn("__c", F.last("__r", ignorenulls=True).over(w))
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
    max_span_bins: int = 4096,
    long_interval: str = "error",
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

    ROW-BOMB GUARD: an interval spanning more than ``max_span_bins`` bins
    (a degenerate/unbounded interval — e.g. a 10-year span at 1-hour bins)
    would explode into that many rows. ``long_interval='error'`` (default)
    fails the job with a clear message naming the dial to turn;
    ``'drop'`` excludes such intervals. Raise ``bin_seconds`` (or
    ``max_span_bins``) when long intervals are legitimate.

    Empty/inverted intervals (end <= start) are dropped (half-open
    semantics — they can contain nothing).
    """
    if long_interval not in ("error", "drop"):
        raise ValueError("long_interval must be 'error' or 'drop'")
    keys = list(key_cols or [])
    w = F.lit(bin_seconds * 1_000_000).cast("long")
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    lpart = events.withColumn("__bin", F.floor(t_us / w))
    first_bin, last_bin = F.floor(s_us / w), F.floor((e_us - 1) / w)
    n_bins = last_bin - first_bin + 1
    rpart = intervals.filter(e_us > s_us)
    if long_interval == "drop":
        rpart = rpart.filter(n_bins <= max_span_bins)
        guarded_last = last_bin
    else:
        # embedded in the hot expression so Catalyst cannot prune it away
        guarded_last = F.when(n_bins <= max_span_bins, last_bin).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_join: interval spans more than {max_span_bins} "
                        f"bins of {bin_seconds}s (start="
                    ),
                    F.col(start_col).cast("string"), F.lit(", end="),
                    F.col(end_col).cast("string"),
                    F.lit(") — raise bin_seconds/max_span_bins or pass "
                          "long_interval='drop'"),
                )
            ).cast("long")
        )
    rpart = rpart.withColumn("__bin", F.explode(F.sequence(first_bin, guarded_last)))
    joined = lpart.join(rpart, keys + ["__bin"])
    t_j = F.unix_micros(F.col(time_col).cast("timestamp"))
    s_j = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_j = F.unix_micros(F.col(end_col).cast("timestamp"))
    return joined.filter((t_j >= s_j) & (t_j < e_j)).drop("__bin")


def scd2_history(
    events: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq_no",
    tiebreak_col: str = "event_id",
    op_col: str | None = None,
    delete_op: str = "D",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a CDC event stream.

    The standard warehouse materialization of a change log: one output row
    per version of a key, carrying ``valid_from`` (the event's own
    ``seq_col``) and ``valid_to`` (the NEXT event's seq for the same key —
    the update or delete that superseded it; NULL while still current) plus
    ``is_current``. Delete events (``op_col == delete_op``) close the prior
    interval but emit no row of their own, so a deleted key simply has no
    open interval.

    ``attr_cols`` opts into CHANGE-ONLY compaction: an event whose tracked
    attributes are all null-safe-equal to the key's previous live version
    extends that version's interval instead of opening a new one (redundant
    upserts — the overwhelmingly common CDC case — collapse away). A
    re-insert after a delete always opens a new interval even if the
    attributes match.

    Plan: ONE keyed exchange + one in-partition sort. Both window passes
    (the lag that detects changes, the lead that closes intervals) share
    the same partitioning and ordering, so Catalyst plans a single
    Exchange + Sort and evaluates them in one Window stage pair with no
    second shuffle. Interval construction is inherently order-dependent
    WITHIN a key; keys are independent, so this scales out exactly like
    the LWW kernel (hash-partition by key). Hot-key caution as for any
    window: one key's whole timeline is one task.

    Reference parity: the reference keeps only latest-state tables (its
    ETL is a full-refresh batch, e.g. the person/death preference joins in
    src/OMOP_MEDS/convert.py); SCD2 is the incremental-engine capability
    that preserves what those full refreshes discard.

    Determinism: (seq_col, tiebreak_col) must totally order events within
    a key (the same contract as last_writer_wins).
    """
    w = W.partitionBy(*key_cols).orderBy(
        F.col(seq_col).asc(), F.col(tiebreak_col).asc())
    df = events
    is_delete = (
        F.col(op_col) == F.lit(delete_op) if op_col is not None else F.lit(False)
    )
    if attr_cols:
        # a row STARTS a version if it is a delete (closes the previous
        # interval), the key's first event, follows a delete, or differs
        # from the previous row in any tracked attribute (null-safe)
        prev_del = F.lag(is_delete).over(w)
        changed = F.lit(False)
        for a in attr_cols:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
        starts = (
            is_delete | prev_del.isNull() | prev_del
            | (~is_delete & changed)
        )
        df = df.withColumn("__starts", starts).filter(F.col("__starts")).drop("__starts")
    out = df.withColumn("valid_from", F.col(seq_col).alias("valid_from")) \
            .withColumn("valid_to", F.lead(F.col(seq_col)).over(w))
    if op_col is not None:
        out = out.filter(~is_delete)
    return out.withColumn("is_current", F.col("valid_to").isNull())


def funnel_match(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Ordered-funnel conversion: users who performed ``steps`` in strict
    time order (step k+1 strictly AFTER step k), with each step's
    completion time — the behavioral-analytics sequence-match operator
    (ClickHouse ``windowFunnel`` / Amplitude funnels analogue).

    Semantics: t1 = min ts of step 1; t_{k+1} = min ts of step k+1 with
    ts > t_k. Only fully-converted users are returned (inner-funnel), one
    row per user with step_1_ts..step_n_ts.

    Spark-first shape — ONE keyed exchange, not k self-joins: the naive
    relational form is a k-step chain of join+min (the oracle SQL), which
    shuffles the event table k times. Here each user's relevant events
    collapse into one ``collect_list`` aggregate (map-side combining, only
    rows matching a step survive the pushed filter), ``array_sort`` orders
    them in-partition, and a single ``F.aggregate`` fold walks the
    timeline carrying the per-step completion state. Cost: one shuffle of
    the filtered events, O(events-per-user) fold work — at 100 TB the
    k-join chain is k full shuffles, this is one.

    Determinism: the fold processes events in (ts, tiebreak) order and
    only ever takes the FIRST qualifying event per step, which equals the
    relational min() because the walk is ascending; equal-ts events
    cannot satisfy the strict > gate in either engine.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.filter(F.col(type_col).isin(*steps))
    evs = F.array_sort(
        F.collect_list(F.struct(
            F.col(ts_col).alias("ts"),
            F.col(tiebreak_col).alias("tb"),
            F.col(type_col).alias("et"),
        ))
    )
    ts_type = events.schema[ts_col].dataType.simpleString()
    zero = F.struct(*[
        F.lit(None).cast(ts_type).alias(f"t{i}") for i in range(len(steps))
    ])

    def fold(acc, e):
        fields = []
        for i, st in enumerate(steps):
            cur = acc[f"t{i}"]
            ok = cur.isNull() & (e["et"] == F.lit(st))
            if i > 0:
                prev = acc[f"t{i-1}"]
                ok = ok & prev.isNotNull() & (e["ts"] > prev)
            fields.append(F.when(ok, e["ts"]).otherwise(cur).alias(f"t{i}"))
        return F.struct(*fields)

    agg = (
        ev.groupBy(user_col)
        .agg(F.aggregate(evs, zero, fold).alias("__f"))
    )
    out = agg.select(
        user_col,
        *[F.col(f"__f.t{i}").alias(f"step{i + 1}_ts") for i in range(len(steps))],
    )
    return out.filter(F.col(f"step{len(steps)}_ts").isNotNull())
