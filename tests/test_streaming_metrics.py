"""Watermarked windowed metrics stream: finalized windows match the batch
computation of the same aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from omop_meds_spark.sources.gen import generate_wal
from omop_meds_spark.streaming.metrics import run_to_memory


def test_streaming_window_counts_match_batch(spark, tmpdir_path):
    wal = f"{tmpdir_path}/wal"
    generate_wal(wal, n_events=5000, n_repos=10, paths_per_repo=30, n_files=5, seed=61)

    got = run_to_memory(spark, wal, name="wm_test", window="600 seconds",
                        watermark="60 seconds", files_per_trigger=2)
    stream_rows = {
        (r["window_start"], r["op"]): r["n_events"] for r in got.collect()
    }
    assert stream_rows, "no finalized windows emitted"

    # batch twin over the same files
    ev = spark.read.parquet(f"{wal}/*.parquet").select("seq_no", "op")
    batch = (
        ev.withColumn("event_time", F.timestamp_seconds(F.col("seq_no")))
        .groupBy(F.window("event_time", "600 seconds").alias("w"), "op")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "op", "n")
    )
    batch_rows = {(r["ws"], r["op"]): r["n"] for r in batch.collect()}

    # append mode only emits watermark-finalized windows — every emitted
    # window must match the batch count exactly
    for k, n in stream_rows.items():
        assert batch_rows[k] == n, k
    # a healthy fraction of windows must have finalized (append emission
    # lags the watermark by one trigger; the tail windows stay open)
    assert len(stream_rows) >= 3


def test_watermarked_dedup_collapses_redelivery(spark, tmpdir_path):
    """Duplicate copies of events delivered across micro-batches (within
    the watermark) collapse to one row per key; the batch distinct is the
    oracle. State stays bounded by the watermark — the semantics of
    dropDuplicatesWithinWatermark."""
    from pathlib import Path

    from omop_meds_spark.streaming.metrics import watermarked_dedup

    src = Path(tmpdir_path) / "dup_events"
    src.mkdir()
    # 60 events over 60 s; every event delivered TWICE: once in its own
    # file, once redelivered in the NEXT file (a 1-batch redelivery lag,
    # well inside the 5-minute watermark)
    base = [(i, 1000 + i) for i in range(60)]  # (event_id, epoch_s)
    files = [base[i * 20:(i + 1) * 20] for i in range(3)]
    deliveries = [files[0], files[0] + files[1], files[1] + files[2], files[2]]
    for f, rows in enumerate(deliveries):
        spark.createDataFrame(rows, "event_id long, epoch_s long").coalesce(1) \
            .write.mode("overwrite").parquet(str(src / f"f{f:03d}.parquet"))

    stream = (
        spark.readStream.schema("event_id long, epoch_s long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("event_time", F.timestamp_seconds(F.col("epoch_s")))
    )
    deduped = watermarked_dedup(stream, ["event_id"], watermark="5 minutes")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir_path}/dedup_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    got = sorted(r.event_id for r in spark.sql("SELECT event_id FROM dedup_out").collect())
    assert got == [i for i, _ in base]  # every event exactly once


def test_stream_stream_join_matches_batch_twin(spark, tmpdir_path):
    """Inner watermarked stream-stream interval join over two parquet
    streams equals the identical-predicate batch join."""
    import pandas as pd
    from omop_meds_spark.streaming.metrics import stream_stream_join

    ldir, rdir = f"{tmpdir_path}/l", f"{tmpdir_path}/r"
    base = pd.Timestamp("2024-01-01")
    # left: one "impression" per (user, minute-slot); right: "clicks" that
    # land 0-15 min later (some outside the 10-min join window)
    lrows = pd.DataFrame({
        "imp_id": range(200),
        "user_id": [i % 20 for i in range(200)],
        "lts": [base + pd.Timedelta(minutes=7 * i % 600) for i in range(200)],
    })
    rrows = pd.DataFrame({
        "click_id": range(300),
        "user_id": [(i * 3) % 20 for i in range(300)],
        "rts": [base + pd.Timedelta(minutes=(7 * (i % 200) % 600) + (i % 16))
                for i in range(300)],
    })
    for df, d, n in ((lrows, ldir, 4), (rrows, rdir, 4)):
        sdf = spark.createDataFrame(df)
        sdf.repartition(n).write.parquet(d)

    lschema = spark.read.parquet(ldir).schema
    rschema = spark.read.parquet(rdir).schema
    lstream = spark.readStream.schema(lschema).option(
        "maxFilesPerTrigger", 2).parquet(ldir)
    rstream = spark.readStream.schema(rschema).option(
        "maxFilesPerTrigger", 2).parquet(rdir)
    joined = stream_stream_join(
        lstream, rstream, ["user_id"], "lts", "rts",
        max_delay="10 minutes", watermark="5 minutes")
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("ssj_test").trigger(availableNow=True).start())
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    got = {tuple(r) for r in
           spark.table("ssj_test").select("imp_id", "click_id").collect()}

    lb = spark.read.parquet(ldir)
    rb = spark.read.parquet(rdir)
    cond = ((lb.user_id == rb.user_id) & (rb.rts >= lb.lts)
            & (rb.rts <= lb.lts + F.expr("INTERVAL 10 minutes")))
    want = {tuple(r) for r in
            lb.join(rb, cond).select("imp_id", "click_id").collect()}
    assert got == want
    assert len(want) > 50  # the workload genuinely joins


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmpdir_path):
    """left_outer: unmatched left rows emit with null right columns once
    the watermark provably passes their join window (a far-future sentinel
    on both sides flushes it)."""
    import pandas as pd
    from omop_meds_spark.streaming.metrics import stream_stream_join

    ldir, rdir = f"{tmpdir_path}/lo_l", f"{tmpdir_path}/lo_r"
    base = pd.Timestamp("2024-01-01")
    far = base + pd.Timedelta(days=30)
    lrows = pd.DataFrame({
        "imp_id": [0, 1, 2, 99],
        "user_id": [1, 2, 3, 999],
        "lts": [base, base, base, far],
    })
    # user 1 clicks inside the window, user 2 outside it, user 3 never
    rrows = pd.DataFrame({
        "click_id": [10, 11, 98],
        "user_id": [1, 2, 999],
        "rts": [base + pd.Timedelta(minutes=5),
                base + pd.Timedelta(minutes=50), far],
    })
    # two files per side so the sentinel batch ADVANCES the watermark
    # after the real data's batch
    spark.createDataFrame(lrows[:3]).coalesce(1).write.parquet(ldir)
    spark.createDataFrame(lrows[3:]).coalesce(1).write.parquet(ldir, mode="append")
    spark.createDataFrame(rrows[:2]).coalesce(1).write.parquet(rdir)
    spark.createDataFrame(rrows[2:]).coalesce(1).write.parquet(rdir, mode="append")

    lschema = spark.read.parquet(ldir).schema
    rschema = spark.read.parquet(rdir).schema
    joined = stream_stream_join(
        spark.readStream.schema(lschema).option("maxFilesPerTrigger", 1).parquet(ldir),
        spark.readStream.schema(rschema).option("maxFilesPerTrigger", 1).parquet(rdir),
        ["user_id"], "lts", "rts",
        max_delay="10 minutes", watermark="1 minute", how="left_outer")
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("ssj_outer").trigger(availableNow=True).start())
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    rows = {r["imp_id"]: r["click_id"]
            for r in spark.table("ssj_outer").collect() if r["imp_id"] != 99}
    assert rows[0] == 10      # matched inside the window
    assert rows[1] is None    # click outside the window -> unmatched
    assert rows[2] is None    # no click at all -> unmatched


def test_streaming_sessionize_matches_batch_sessions(spark, tmpdir_path):
    """Finalized streaming session windows equal the batch lag/cumsum
    sessionization (same 30-min gap) on sessions the watermark closed."""
    import pandas as pd
    from pyspark.sql import Window as W
    from omop_meds_spark.streaming.metrics import streaming_sessionize

    d = f"{tmpdir_path}/sess"
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u in range(8):
        ts = base + pd.Timedelta(minutes=u)
        for s in range(4):           # 4 sessions per user
            for k in range(1 + (u + s) % 3):   # 1-3 events per session
                rows.append({"event_id": eid, "user_id": u, "ts": ts})
                eid += 1
                ts += pd.Timedelta(minutes=5)
            ts += pd.Timedelta(minutes=45)     # > gap -> new session
    pdf = pd.DataFrame(rows)
    # far-future sentinel advances the watermark past every real session
    sent = pd.DataFrame([{"event_id": eid, "user_id": 999,
                          "ts": base + pd.Timedelta(days=30)}])
    spark.createDataFrame(pdf).coalesce(2).write.parquet(d)
    spark.createDataFrame(sent).coalesce(1).write.parquet(d, mode="append")

    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(d)
              .withColumnRenamed("ts", "event_time"))
    q = (streaming_sessionize(stream, gap="30 minutes", watermark="10 minutes")
         .writeStream.outputMode("append").format("memory")
         .queryName("sess_test").trigger(availableNow=True).start())
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    got = {(r["user_id"], r["session_start"], r["n_events"])
           for r in spark.table("sess_test").collect() if r["user_id"] != 999}

    # batch twin: lag/cumsum session ids -> per-session (start, count)
    ev = spark.read.parquet(d).filter(F.col("user_id") != 999)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTES")),
        F.lit(1)).otherwise(F.lit(0))
    sess = F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0))
    want = {(r["user_id"], r["session_start"], r["n_events"])
            for r in (ev.withColumn("sid", sess)
                      .groupBy("user_id", "sid")
                      .agg(F.min("ts").alias("session_start"),
                           F.count("*").alias("n_events"))
                      .collect())}
    assert got == want
    assert len(want) == 8 * 4
