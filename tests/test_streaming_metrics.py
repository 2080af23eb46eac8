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
