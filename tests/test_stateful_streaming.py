"""applyInPandasWithState: per-key state survives across micro-batches and
converges to the batch groupBy twin regardless of batch composition."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F


def _write_event_files(spark, d: Path, n_files: int = 4, rows_per: int = 200):
    rows = [
        (int(i % 17), float((i * 37) % 991), i)
        for i in range(n_files * rows_per)
    ]
    df = spark.createDataFrame(rows, "user_id long, value double, seq long")
    for f in range(n_files):
        part = df.filter((F.col("seq") % n_files) == f).drop("seq")
        part.coalesce(1).write.mode("overwrite").parquet(str(d / f"f{f:03d}.parquet"))
    return df.drop("seq")


def test_stateful_totals_match_batch_twin(spark, tmpdir_path):
    from omop_meds_spark.streaming.stateful import stateful_event_totals

    src = Path(tmpdir_path) / "events"
    src.mkdir()
    full = _write_event_files(spark, src)

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(str(src / "*"))
    )
    totals = stateful_event_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    # update mode appends one row per (key, batch); n_events is monotone,
    # so the per-key max row is the final state
    emitted = spark.sql("SELECT * FROM totals")
    final = (
        emitted.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
    )
    got = {(r["user_id"], r["n_events"], r["max_value"]) for r in final.collect()}

    expect = {
        (r["user_id"], r["n_events"], r["max_value"])
        for r in full.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .collect()
    }
    assert got == expect
    # state really crossed batches: keys appear in multiple emitted rows
    assert emitted.count() > final.count()


def test_streaming_funnel_corrects_out_of_order_arrival(spark, tmpdir_path):
    """Events are delivered NEWEST-FIRST across micro-batches (file 0 =
    latest timestamps), so every early emission is computed from a
    timeline suffix; the recompute-from-state design must retract and
    correct as earlier events land, converging to the batch funnel."""
    import datetime as dt
    import random

    from omop_meds_spark.operators.temporal import funnel_match
    from omop_meds_spark.streaming.stateful import stateful_funnel

    rng = random.Random(7)
    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for user in range(40):
        for _ in range(rng.randint(0, 12)):
            ts = t0 + dt.timedelta(seconds=rng.randint(0, 9))
            rows.append((user, ts, eid, rng.choice(["view", "click", "purchase", "noise"])))
            eid += 1
    # pinned case: purchase arrives FIRST (latest file read = earliest batch),
    # view arrives LAST -> early emissions say unconverted, final converged.
    # The three events sit in DIFFERENT time quartiles (seconds 9/5/0) so
    # the newest-first file chunking below puts them in different
    # micro-batches.
    rows += [
        (999, t0 + dt.timedelta(seconds=9), eid + 1, "purchase"),
        (999, t0 + dt.timedelta(seconds=5), eid + 2, "click"),
        (999, t0, eid + 3, "view"),
    ]
    full = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")

    src = Path(tmpdir_path) / "funnel_events"
    src.mkdir()
    ordered = sorted(rows, key=lambda r: r[1], reverse=True)  # newest first
    n_files = 4
    per = (len(ordered) + n_files - 1) // n_files
    for f in range(n_files):
        chunk = ordered[f * per:(f + 1) * per]
        spark.createDataFrame(
            chunk, "user_id long, ts timestamp, event_id long, event_type string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{f:03d}.parquet"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stateful_funnel(stream, ["view", "click", "purchase"])
        .writeStream.format("memory").queryName("funnel_updates")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_path}/funnel_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    emitted = spark.sql("SELECT * FROM funnel_updates")
    # latest state per user = the max-n_seen row (n_seen is monotone)
    from pyspark.sql.window import Window

    latest = emitted.withColumn(
        "_rk", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.col("n_seen").desc()))
    ).filter("_rk = 1")
    got = {
        r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts)
        for r in latest.filter("converted").collect()
    }
    expect = {
        r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts)
        for r in funnel_match(full, ["view", "click", "purchase"]).collect()
    }
    assert got == expect
    assert 999 in got  # the pinned out-of-order user converged
    # and its early emission really was a stale 'unconverted' answer
    u999 = emitted.filter("user_id = 999").orderBy("n_seen").collect()
    assert len(u999) >= 2 and not u999[0].converted and u999[-1].converted


def test_streaming_funnel_string_key_and_custom_cols(spark, tmpdir_path):
    """The key/ts/type columns are parameterized like the batch twin's:
    a STRING key must flow through the emitted schema (the key field's
    type is taken from the input schema, not pinned to long)."""
    import datetime as dt

    from omop_meds_spark.streaming.stateful import stateful_funnel

    t0 = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        ("alice", t0, "A"), ("alice", t0 + s, "B"),
        ("bob", t0, "B"), ("bob", t0 + s, "A"),
    ]
    src = Path(tmpdir_path) / "skey_events"
    src.mkdir()
    spark.createDataFrame(rows, "who string, at timestamp, kind string") \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "f0.parquet"))
    stream = (
        spark.readStream.schema("who string, at timestamp, kind string")
        .parquet(str(src / "*"))
    )
    q = (
        stateful_funnel(stream, ["A", "B"], key_col="who", ts_col="at",
                        type_col="kind")
        .writeStream.format("memory").queryName("skey_funnel")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir_path}/skey_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    got = {r.who: r.converted for r in spark.sql("SELECT * FROM skey_funnel").collect()}
    assert got == {"alice": True, "bob": False}
