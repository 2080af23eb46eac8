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
