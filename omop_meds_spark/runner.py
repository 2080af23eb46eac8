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
        """Apply one micro-batch; returns metrics dict, or None if the
        batch was already committed (idempotent replay)."""
        if batch.batch_id in self.table.committed_batches():
            return None
        t0 = time.monotonic()

        events = self.reader.read_batch(self.spark, batch, self.registry)
        events = self.normalize(events)
        events = dedup_events(events)
        winners = last_writer_wins(
            events, KEY_COLS, n_salts=self.n_salts, salted=True
        ).withColumn(BUCKET_COL, bucket_expr(KEY_COLS, self.n_buckets))

        # one pass over the batch: touched buckets + counts + seq range
        stats = winners.agg(
            F.collect_set(BUCKET_COL).alias("buckets"),
            F.count("*").alias("n_keys"),
            F.min("seq_no").alias("seq_min"),
            F.max("seq_no").alias("seq_max"),
        ).collect()[0]
        touched = sorted(stats["buckets"])

        state = self.table.read(self.spark, buckets=touched)
        merged = merge_state(state, winners, KEY_COLS)

        n_events = events.count()
        wall = None  # set after commit (the write is the execution point)
        committed = self.table.commit_merged(
            merged,
            batch_id=batch.batch_id,
            touched_buckets=touched,
            watermark_seq=int(stats["seq_max"]),
            lineage={
                "files": list(batch.files),
                "seq_min": int(stats["seq_min"]),
                "seq_max": int(stats["seq_max"]),
                "n_events": n_events,
                "n_keys": int(stats["n_keys"]),
                "schema_version": self.registry.version,
            },
            metrics={},
            schema_json=self.registry.schema_json(),
        )
        wall = time.monotonic() - t0
        m = {
            "batch_id": batch.batch_id,
            "n_events": n_events,
            "n_keys": int(stats["n_keys"]),
            "wall_s": wall,
            "events_per_s": n_events / wall if wall > 0 else 0.0,
            "committed": committed,
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
