"""As-of join semantics: latest preceding right row, ties included, no
future leakage, null when nothing precedes."""

from __future__ import annotations

from datetime import datetime

from omop_meds_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_preceding(spark):
    left = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00")),  # before any dim row → null
            (2, "A", _ts("2024-01-01 12:00:00")),  # tie with dim@12:00 → included
            (3, "A", _ts("2024-01-01 13:30:00")),  # between 12:00 and 14:00
            (4, "A", _ts("2024-01-01 15:00:00")),  # after 14:00
            (5, "B", _ts("2024-01-01 12:30:00")),  # other key
            (6, "C", _ts("2024-01-01 12:30:00")),  # key with no dim rows at all
        ],
        "id long, k string, t timestamp",
    )
    dim = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 12:00:00"), 100.0),
            ("A", _ts("2024-01-01 14:00:00"), 200.0),
            ("B", _ts("2024-01-01 12:00:00"), 50.0),
        ],
        "k string, dim_t timestamp, price double",
    )
    out = asof_join(left, dim, ["k"], "t", "dim_t")
    got = {r["id"]: (r["price"], r["dim_t"]) for r in out.collect()}
    assert got[1] == (None, None)
    assert got[2] == (100.0, _ts("2024-01-01 12:00:00"))
    assert got[3] == (100.0, _ts("2024-01-01 12:00:00"))
    assert got[4] == (200.0, _ts("2024-01-01 14:00:00"))
    assert got[5] == (50.0, _ts("2024-01-01 12:00:00"))
    assert got[6] == (None, None)
    assert out.count() == 6  # left join: every left row survives


def test_asof_join_partition_invariant(spark):
    import pyspark.sql.functions as F

    rows = [(i, f"k{i % 7}", _ts("2024-01-01 00:00:00")) for i in range(100)]
    left = spark.createDataFrame(rows, "id long, k string, t timestamp").withColumn(
        "t", F.col("t") + F.make_interval(mins=F.col("id"))
    )
    dim = left.filter(F.col("id") % 10 == 0).select(
        "k", F.col("t").alias("dim_t"), (F.col("id") * 1.5).alias("v")
    )
    a = {tuple(r) for r in asof_join(left, dim, ["k"], "t", "dim_t").collect()}
    b = {
        tuple(r)
        for r in asof_join(
            left.repartition(13).orderBy(F.rand(seed=5)), dim.repartition(3), ["k"], "t", "dim_t"
        ).collect()
    }
    assert a == b


def test_asof_join_rejects_colliding_right_columns(spark):
    """A right value column sharing a name with a left column would emit
    duplicate output names that break select-by-name silently — raise."""
    import pytest

    left = spark.createDataFrame([(1, "A", _ts("2024-01-01 10:00:00"), 5.0)],
                                 "id long, k string, t timestamp, price double")
    dim = spark.createDataFrame([("A", _ts("2024-01-01 09:00:00"), 1.0)],
                                "k string, dim_t timestamp, price double")
    with pytest.raises(ValueError, match="price"):
        asof_join(left, dim, ["k"], "t", "dim_t")


def test_asof_join_hot_key_bucketing_matches_plain(spark):
    """Single-key skew corpus: the time-bucketed plan must return the
    bit-identical result to the plain window while splitting the hot key
    across many window partitions (no single straggler task owns the whole
    timeline)."""
    import pyspark.sql.functions as F

    n = 5000
    left = (
        spark.range(n).select(
            F.col("id"),
            F.lit("hot").alias("k"),
            (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
             + F.make_interval(mins=F.col("id"))).alias("t"),
        )
    )
    dim = left.filter(F.col("id") % 97 == 0).select(
        "k", F.col("t").alias("dim_t"), (F.col("id") * 2.0).alias("v")
    )
    plain = asof_join(left, dim, ["k"], "t", "dim_t")
    bucketed = asof_join(left, dim, ["k"], "t", "dim_t", bucket_seconds=6 * 3600)
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in bucketed.collect()}
    assert a == b and len(a) == n
    # the hot key genuinely fans out: many distinct (key, bucket) partitions
    n_buckets = (
        left.select(F.floor(F.unix_micros("t") / (6 * 3600 * 1_000_000)).alias("b"))
        .distinct().count()
    )
    assert n_buckets > 10


def test_asof_join_hot_key_seeds_empty_buckets(spark):
    """A left bucket with no right rows anywhere nearby must still see the
    carry from much earlier buckets (seed correctness across gaps)."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-06-01 10:00:00"))], "id long, k string, t timestamp"
    )
    dim = spark.createDataFrame(
        [("A", _ts("2024-01-01 00:00:00"), 42.0)], "k string, dim_t timestamp, v double"
    )
    out = asof_join(left, dim, ["k"], "t", "dim_t", bucket_seconds=3600).collect()
    assert out[0]["v"] == 42.0


def test_interval_join_long_interval_guard(spark):
    """A degenerate 10-year interval must not become an 87k-row bomb:
    default mode fails the job with the dial named; 'drop' completes with
    the degenerate interval excluded."""
    import pytest
    from omop_meds_spark.operators.temporal import interval_join

    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (2, _ts("2029-01-01 10:00:00"))],
        "id long, t timestamp",
    )
    iv = spark.createDataFrame(
        [(100, _ts("2024-01-01 00:00:00"), _ts("2034-01-01 00:00:00")),  # 10y bomb
         (101, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    with pytest.raises(Exception, match="max_span_bins|spans more than"):
        interval_join(ev, iv, "t", "s", "e").collect()
    got = {(r["id"], r["iid"])
           for r in interval_join(ev, iv, "t", "s", "e",
                                  long_interval="drop").collect()}
    assert got == {(1, 101)}
    # a legitimately long interval passes once the dials are raised
    wide = {(r["id"], r["iid"])
            for r in interval_join(ev, iv, "t", "s", "e",
                                   bin_seconds=30 * 24 * 3600).collect()}
    assert wide == {(1, 100), (1, 101), (2, 100)}


def test_interval_join_containment_and_edges(spark):
    from omop_meds_spark.operators.temporal import interval_join

    ev = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00")),  # == start → included
            (2, "A", _ts("2024-01-01 11:59:59")),  # inside
            (3, "A", _ts("2024-01-01 12:00:00")),  # == end → excluded (half-open)
            (4, "A", _ts("2024-01-02 10:30:00")),  # inside second interval only
            (5, "B", _ts("2024-01-01 10:30:00")),  # wrong key
            (6, "A", _ts("2024-03-01 10:30:00")),  # no interval
        ],
        "id long, k string, t timestamp",
    )
    iv = spark.createDataFrame(
        [
            (100, "A", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00")),
            (101, "A", _ts("2024-01-02 10:00:00"), _ts("2024-01-02 12:00:00")),
            (102, "A", _ts("2024-05-01 10:00:00"), _ts("2024-05-01 10:00:00")),  # empty
            (103, "B", _ts("2024-06-01 10:00:00"), _ts("2024-06-01 09:00:00")),  # inverted
        ],
        "iid long, k string, s timestamp, e timestamp",
    )
    got = {(r["id"], r["iid"])
           for r in interval_join(ev, iv, "t", "s", "e", key_cols=["k"]).collect()}
    assert got == {(1, 100), (2, 100), (4, 101)}
    # overlapping intervals: an event matches each containing interval once
    iv2 = spark.createDataFrame(
        [(200, "A", _ts("2024-01-01 09:00:00"), _ts("2024-01-01 13:00:00")),
         (201, "A", _ts("2024-01-01 10:30:00"), _ts("2024-01-01 12:30:00"))],
        "iid long, k string, s timestamp, e timestamp",
    )
    got2 = sorted(
        (r["id"], r["iid"])
        for r in interval_join(ev.filter("id = 2"), iv2, "t", "s", "e",
                               key_cols=["k"], bin_seconds=900).collect()
    )
    assert got2 == [(2, 200), (2, 201)]


def test_interval_join_plan_is_hash_join(spark):
    """The binned shape must compile to a hash equi-join, never a
    nested-loop theta join."""
    from omop_meds_spark.operators.temporal import interval_join

    ev = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "id long, t timestamp")
    iv = spark.createDataFrame(
        [(9, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    plan = interval_join(ev, iv, "t", "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


# ---------------------------------------------------------------- SCD2

def _scd_events(spark):
    # key A: insert, redundant upsert (same attrs), change, delete, re-insert
    # key B: single insert (stays current)
    rows = [
        (1, "A", 10, "x", 1.0, "U"),
        (2, "A", 20, "x", 2.0, "U"),   # same type as prev (folds in change-only)
        (3, "A", 30, "y", 3.0, "U"),   # type change
        (4, "A", 40, "y", 4.0, "D"),   # delete closes the interval
        (5, "A", 50, "y", 5.0, "U"),   # re-insert after delete (same attrs!)
        (6, "B", 15, "z", 6.0, "U"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, k string, seq_no long, attr string, v double, op string")


def test_scd2_history_full(spark):
    from omop_meds_spark.operators.temporal import scd2_history

    out = scd2_history(_scd_events(spark), ["k"], op_col="op").select(
        "event_id", "valid_from", "valid_to", "is_current")
    got = {r["event_id"]: (r["valid_from"], r["valid_to"], r["is_current"])
           for r in out.collect()}
    assert got == {
        1: (10, 20, False),
        2: (20, 30, False),
        3: (30, 40, False),   # closed by the delete, no row for the delete
        5: (50, None, True),  # re-insert is current
        6: (15, None, True),
    }


def test_scd2_change_only_folds_and_reopens(spark):
    from omop_meds_spark.operators.temporal import scd2_history

    out = scd2_history(_scd_events(spark), ["k"], op_col="op",
                       attr_cols=["attr"]).select(
        "event_id", "valid_from", "valid_to", "is_current", "attr")
    got = {r["event_id"]: (r["valid_from"], r["valid_to"], r["is_current"])
           for r in out.collect()}
    # event 2 folded into event 1's interval; event 5 reopens after the
    # delete even though attr matches the pre-delete version
    assert got == {
        1: (10, 30, False),
        3: (30, 40, False),
        5: (50, None, True),
        6: (15, None, True),
    }


def test_scd2_single_exchange_plan(spark):
    """Both windows (change-detect lag + interval lead) share one
    partitioning: exactly ONE exchange in the physical plan."""
    import re

    from omop_meds_spark.operators.temporal import scd2_history

    for attrs in (None, ["attr"]):
        out = scd2_history(_scd_events(spark), ["k"], op_col="op",
                           attr_cols=attrs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
        assert n == 1, f"attrs={attrs}: expected 1 exchange, got {n}\n{plan}"
