"""Micro-batch CDC driver loop: WAL tail → normalize → upsert → commit.

Spark recast of the reference's batched main loop
(src/OMOP_MEDS/pre_meds.py:290-416): per micro-batch,

1. read + align the WAL files (schema registry evolves on new/renamed/
   widened columns),
2. normalize (content sha256 via ``F.sha2`` — JVM-side, no Python),
3. exactly-once dedup on event_id, then salted last-writer-wins per
   (repo, path),
4. MERGE into the bucketed snapshot table: only buckets touched by the
   batch are read + rewritten (copy-on-write), tombstones retained,
5. transactional commit (manifest with lineage + metrics + offsets);
   an already-committed batch_id is a no-op → resume/replay safe.

Scale notes: per-batch cost is O(batch events + touched-bucket state); the
state read is manifest-pruned to touched buckets; both the LWW agg and the
merge shuffle hash-partition on the key, and the hot-repo skew is absorbed
by the salted two-phase agg + AQE. Nothing in the loop collects data to the
driver except the distinct touched-bucket ids (≤ n_buckets ints).
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.meds import MEDS_KEY_COLS, change_winners_to_meds
from .operators.upsert import dedup_events, last_writer_wins, merge_state
from .plans.align import SchemaRegistry
from .schemas import (
    CANONICAL_RENAMES,
    CHANGE_EVENT_SCHEMA_V0,
    CONTENT_HASH_COL,
    KEY_COLS,
)
from .sources.wal import WalBatch, WalReader
from .table import BUCKET_COL, SnapshotTable, bucket_expr


def merge_commit_target(
    spark: SparkSession,
    table: SnapshotTable,
    delta: DataFrame,
    batch_id: int,
    lineage: dict,
    schema_json: str | None = None,
) -> dict:
    """MERGE a per-key delta (one winner row per key, CDC envelope intact)
    into a snapshot table and commit — the shared kernel behind both the
    source-mirror state table and the MEDS-shaped target. One driver
    round-trip (≤ n_buckets stat rows); reads only touched buckets."""
    if batch_id in table.committed_batches():
        return {"n_keys": 0, "seq_min": None, "seq_max": table.watermark(),
                "skipped": True}
    delta = delta.withColumn(BUCKET_COL, bucket_expr(table.key_cols, table.n_buckets))
    bstats = delta.groupBy(BUCKET_COL).agg(
        F.count("*").alias("n"),
        F.min("seq_no").alias("lo"),
        F.max("seq_no").alias("hi"),
    ).collect()
    if not bstats:  # empty batch still commits (marks batch_id applied)
        table.commit_merged(delta, batch_id=batch_id, touched_buckets=[],
                            watermark_seq=table.watermark(), lineage=lineage,
                            schema_json=schema_json)
        return {"n_keys": 0, "seq_min": None, "seq_max": table.watermark()}
    touched = sorted(int(r[BUCKET_COL]) for r in bstats)
    n_keys = sum(int(r["n"]) for r in bstats)
    seq_min = min(int(r["lo"]) for r in bstats)
    seq_max = max(int(r["hi"]) for r in bstats)
    state = table.read(spark, buckets=touched)
    merged = merge_state(state, delta, table.key_cols)
    table.commit_merged(
        merged,
        batch_id=batch_id,
        touched_buckets=touched,
        watermark_seq=seq_max,
        lineage={**lineage, "seq_min": seq_min, "seq_max": seq_max, "n_keys": n_keys},
        schema_json=schema_json,
        offsets={int(r[BUCKET_COL]): int(r["hi"]) for r in bstats},
    )
    return {"n_keys": n_keys, "seq_min": seq_min, "seq_max": seq_max}


class CDCRunner:
    def __init__(
        self,
        spark: SparkSession,
        wal_dir: str | Path,
        table_root: str | Path,
        n_buckets: int = 32,
        files_per_batch: int = 4,
        n_salts: int = 16,
    ):
        self.spark = spark
        self.reader = WalReader(wal_dir, files_per_batch)
        self.table = SnapshotTable(table_root, KEY_COLS, n_buckets)
        # MEDS-shaped target (subject_id, time, code, numeric_value, …) —
        # the north star's actual sink shape; merged per-batch from the same
        # winners, own snapshot log under {root}/meds.
        self.meds_table = SnapshotTable(
            Path(table_root) / "meds", MEDS_KEY_COLS, n_buckets
        )
        self.registry = SchemaRegistry(
            target=CHANGE_EVENT_SCHEMA_V0, renames=dict(CANONICAL_RENAMES)
        )
        self.n_buckets = n_buckets
        self.n_salts = n_salts
        self.metrics: list[dict] = []

    # ------------------------------------------------------------- stages
    def normalize(self, df: DataFrame) -> DataFrame:
        """Vectorized normalization — content hash is F.sha2 (JVM, codegen);
        the reference's per-row hashing needs never touch Python."""
        return df.withColumn(CONTENT_HASH_COL, F.sha2(F.col("content"), 256))

    def apply_batch(self, batch: WalBatch) -> dict | None:
        """Apply one micro-batch to BOTH targets; returns metrics dict, or
        None if the batch was already fully committed (idempotent replay).
        Each target's commit log is independently idempotent, so a crash
        between the two commits re-runs only the missing one."""
        done_state = batch.batch_id in self.table.committed_batches()
        done_meds = batch.batch_id in self.meds_table.committed_batches()
        if done_state and done_meds:
            return None
        t0 = time.monotonic()

        events = self.reader.read_batch(self.spark, batch, self.registry)
        events = self.normalize(events)
        events = dedup_events(events)
        # winners feed two merges — persist so dedup+salted LWW run once.
        winners = last_writer_wins(events, KEY_COLS, n_salts=self.n_salts, salted=True).persist()
        try:
            lineage = {"files": list(batch.files), "schema_version": self.registry.version}
            stats = merge_commit_target(
                self.spark, self.table, winners, batch.batch_id,
                lineage=lineage, schema_json=self.registry.schema_json(),
            )
            merge_commit_target(
                self.spark, self.meds_table, change_winners_to_meds(winners),
                batch.batch_id, lineage={**lineage, "target": "meds"},
            )
            n_events = events.count()
        finally:
            winners.unpersist()
        wall = time.monotonic() - t0
        m = {
            "batch_id": batch.batch_id,
            "n_events": n_events,
            "n_keys": stats["n_keys"],
            "wall_s": wall,
            "events_per_s": n_events / wall if wall > 0 else 0.0,
            "committed": True,
        }
        self.metrics.append(m)
        return m

    def run(self) -> list[dict]:
        """Replay the whole WAL (skipping committed batches — resume)."""
        out = []
        for batch in self.reader.plan_batches():
            m = self.apply_batch(batch)
            if m is not None:
                out.append(m)
        return out

    # ------------------------------------------------------------ queries
    def final_state(self) -> DataFrame | None:
        return self.table.read_live(self.spark)

    def final_meds(self) -> DataFrame | None:
        """The live MEDS-shaped target (subject_id, time, code,
        numeric_value, text_value)."""
        return self.meds_table.read_live(self.spark)
