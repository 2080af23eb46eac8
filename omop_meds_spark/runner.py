"""Micro-batch CDC driver loop: WAL tail → normalize → upsert → commit.

Spark recast of the reference's batched main loop
(src/OMOP_MEDS/pre_meds.py:290-416): per micro-batch,

1. read + align the WAL files (schema registry evolves on new/renamed/
   widened columns),
2. normalize (content sha256 via ``F.sha2`` — JVM-side, no Python),
3. last-writer-wins per (repo, path) — exactly-once under redelivery
   because identical duplicate copies cannot change a max_by winner
   (see operators/upsert.py; explicit salting available via ``salted=``),
4. MERGE into BOTH bucketed snapshot tables (source-mirror state +
   MEDS-shaped target): only buckets touched by the batch are read +
   rewritten (copy-on-write), tombstones retained,
5. transactional commit per target (manifest with lineage + metrics +
   per-bucket offsets); an already-committed batch_id is a no-op →
   resume/replay safe, even if a crash lands between the two commits.

Scale notes: per-batch cost is O(batch events + touched-bucket state); the
state read is manifest-pruned to touched buckets; the LWW agg and the merge
shuffle hash-partition on the key with map-side combine bounding hot-key
fan-in, plus AQE. Exactly 3 Spark actions per batch (one combined stats
pass that also materializes the winners cache, then one write per target);
nothing collects to the driver except ≤ n_buckets² tiny stat rows.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.meds import (
    MEDS_KEY_COLS,
    change_winners_to_meds,
    meds_bucket_expr_from_change,
)
from .operators.upsert import last_writer_wins
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
    bstats: list | None = None,
) -> dict:
    """Commit a per-key delta (one winner row per key, CDC envelope intact)
    into a snapshot table — the shared kernel behind both the source-mirror
    state table and the MEDS-shaped target. MERGE-ON-READ flavor: winners
    are appended as a new delta generation, NO state read, NO rewrite
    (write amplification O(batch), not O(state)); ``SnapshotTable.compact``
    periodically folds generations and ``read_live`` LWW-reduces. ``bstats``
    (rows with bucket/n/lo/hi under keys ``[BUCKET_COL, 'n', 'lo', 'hi']``)
    may be precomputed by the caller to fold several targets' stats into
    one Spark job."""
    if batch_id in table.committed_batches():
        return {"n_keys": 0, "seq_min": None, "seq_max": table.watermark(),
                "skipped": True}
    delta = delta.withColumn(BUCKET_COL, bucket_expr(table.key_cols, table.n_buckets))
    if bstats is None:
        bstats = delta.groupBy(BUCKET_COL).agg(
            F.count("*").alias("n"),
            F.min("seq_no").alias("lo"),
            F.max("seq_no").alias("hi"),
        ).collect()
    if not bstats:  # empty batch still commits (marks batch_id applied)
        table.commit_delta(delta, batch_id=batch_id, touched_buckets=[],
                           watermark_seq=table.watermark(), lineage=lineage,
                           schema_json=schema_json)
        return {"n_keys": 0, "seq_min": None, "seq_max": table.watermark()}
    touched = sorted(int(r[BUCKET_COL]) for r in bstats)
    n_keys = sum(int(r["n"]) for r in bstats)
    seq_min = min(int(r["lo"]) for r in bstats)
    seq_max = max(int(r["hi"]) for r in bstats)
    table.commit_delta(
        delta,
        batch_id=batch_id,
        touched_buckets=touched,
        watermark_seq=seq_max,
        lineage={**lineage, "seq_min": seq_min, "seq_max": seq_max, "n_keys": n_keys},
        schema_json=schema_json,
        offsets={int(r[BUCKET_COL]): int(r["hi"]) for r in bstats},
    )
    return {"n_keys": n_keys, "seq_min": seq_min, "seq_max": seq_max}


LANG_CODE_MAP = {
    "py": "LANG//python", "rs": "LANG//rust", "go": "LANG//go",
    "js": "LANG//javascript", "java": "LANG//java", "c": "LANG//c",
    "md": "LANG//markdown",
}


def normalize_events(df: DataFrame) -> DataFrame:
    """Event-normalization + code-mapping stage — the CDC recast of the
    reference's convert/fixes stages (pre-MEDS NLP features
    src/OMOP_MEDS/pre_meds_utils.py:949-1177, concept mapping :318-463),
    exactly per the north rule: vectorized pandas/Arrow UDFs and DataFrame
    ops only, no per-row Python.

    * ``content_sha256`` — F.sha2 (JVM codegen; the per-row invariant),
    * text analytics (token count, language ID, line metrics) — JVM regex /
      array Columns (whole-stage codegen; the pandas-UDF twin
      ``arrow_udfs.content_metrics`` is tested bit-equal and swaps in where
      Python-side libraries are needed),
    * ``lang_code`` — code-mapping via a closed-over Arrow-batched pandas
      UDF (the concept-dictionary analogue; broadcast-join variant in
      operators/joins.py for large dictionaries).

    All derived columns persist into the state table (they are the
    convert-stage output, not scratch) and are reproduced by the pandas
    replay oracle.
    """
    from .functions import text as TX
    from .functions.arrow_udfs import content_metrics_builtin, make_code_mapper

    mapper = make_code_mapper(LANG_CODE_MAP)
    c = F.col("content")
    n_lines, _n_bytes, max_line_len = content_metrics_builtin(c)
    return (
        df.withColumn(CONTENT_HASH_COL, F.sha2(c, 256))
        .withColumn("token_count", TX.token_count(c))
        .withColumn("lang_pred", TX.lang_id(c))
        .withColumn("n_lines", n_lines)
        .withColumn("max_line_len", max_line_len)
        .withColumn("lang_code", mapper(F.col("lang")))
    )


def _regroup(rows: list, bucket_field: str) -> list[dict]:
    """Driver-side re-aggregation of the combined (state-bucket, meds-bucket)
    stats to one target's per-bucket stats."""
    acc: dict[int, dict] = {}
    for r in rows:
        b = int(r[bucket_field])
        a = acc.get(b)
        if a is None:
            acc[b] = {BUCKET_COL: b, "n": int(r["n"]), "lo": int(r["lo"]), "hi": int(r["hi"])}
        else:
            a["n"] += int(r["n"])
            a["lo"] = min(a["lo"], int(r["lo"]))
            a["hi"] = max(a["hi"], int(r["hi"]))
    return [acc[b] for b in sorted(acc)]


class CDCRunner:
    """Micro-batch CDC driver.

    SOURCE CONTRACT (at-least-once delivery): redelivered copies of an
    event must be byte-identical — then the LWW ``max_by`` over (seq_no,
    event_id) is idempotent with NO dedup shuffle. If the source can
    redeliver non-identical copies (the known case: copies of one event in
    files that straddle a schema-registry widening, so one aligns with a
    null new column and the other with a populated one), set
    ``dedup=True``: each batch is first reduced to one deterministic copy
    per (seq_no, event_id) — the most-populated copy, total-order
    tie-broken (see ``operators.upsert.dedup_events_canonical``) — at the
    cost of one extra keyed shuffle per batch.
    """

    def __init__(
        self,
        spark: SparkSession,
        wal_dir: str | Path,
        table_root: str | Path,
        n_buckets: int = 32,
        files_per_batch: int = 4,
        n_salts: int = 16,
        salted: bool = False,
        compact_every: int = 8,
        dedup: bool = False,
    ):
        self.spark = spark
        self.salted = salted
        self.dedup = dedup
        # compact when a bucket accumulates this many delta generations —
        # bounds read_live cost; compaction cost amortizes over batches
        self.compact_every = compact_every
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
        return normalize_events(df)

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
        # Default: no dedup shuffle — the byte-identical-redelivery source
        # contract (class docstring) makes max_by idempotent under
        # at-least-once delivery. dedup=True inserts the deterministic
        # canonical-copy reduction for sources that violate it.
        if self.dedup:
            from .operators.upsert import dedup_events_canonical

            events = dedup_events_canonical(events)
        # winners feed two merges — persist so the LWW shuffle runs once.
        winners = last_writer_wins(
            events, KEY_COLS, n_salts=self.n_salts, salted=self.salted
        ).persist()
        try:
            lineage = {"files": list(batch.files), "schema_version": self.registry.version}
            # ONE stats job for both targets: the MEDS bucket is a pure
            # function of (repo, path), so a single grouped pass (also the
            # action that materializes the winners cache) yields per-bucket
            # stats for the state AND meds tables (≤ n_buckets² tiny rows).
            combined = winners.groupBy(
                bucket_expr(KEY_COLS, self.n_buckets).alias("bs"),
                meds_bucket_expr_from_change(self.n_buckets).alias("bm"),
            ).agg(
                F.count("*").alias("n"),
                F.min("seq_no").alias("lo"),
                F.max("seq_no").alias("hi"),
            ).collect()
            stats_for = {
                "bs": _regroup(combined, "bs"),
                "bm": _regroup(combined, "bm"),
            }
            stats = merge_commit_target(
                self.spark, self.table, winners, batch.batch_id,
                lineage=lineage, schema_json=self.registry.schema_json(),
                bstats=stats_for["bs"],
            )
            merge_commit_target(
                self.spark, self.meds_table, change_winners_to_meds(winners),
                batch.batch_id, lineage={**lineage, "target": "meds"},
                bstats=stats_for["bm"],
            )
            # footer-only count — no extra Spark pass over the batch
            n_events = self.reader.footer_rows(batch)
            # incremental compaction: only buckets whose generation count
            # hit the threshold are read + rewritten (O(hot buckets), not
            # O(table) — a hot key can no longer trigger full-table rewrites
            # from the hot loop)
            for t in (self.table, self.meds_table):
                hot = t.hot_buckets(self.compact_every)
                if hot:
                    t.compact(self.spark, buckets=hot)
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
