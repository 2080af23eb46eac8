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
