"""MEDS event conversion: wide rows → long event streams (declared).

The reference declares per-table event templates in YAML
(configs/event_configs.yaml: each wide pre-MEDS row emits 1..n MEDS events,
e.g. a visit emits ``//start`` and ``//end`` events with different time
columns) and MEDS-Transforms' ``convert_to_MEDS_events`` stage applies them.

Spark recast: each event block is a projection to the canonical MEDS shape;
a row's blocks are assembled into an array of structs and exploded — one
narrow shuffle-free select + generate, fully codegen'd. ``unionByName`` of
per-block projections is equivalent; explode keeps it single-pass.

An EventBlock's fields are Column *expressions*, so code templates
(``vocab//concept//start``) and numeric extraction compose freely.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class EventBlock:
    """One event emitted per wide row (when ``when`` is satisfied).

    ``extras`` are passthrough output columns beyond the canonical MEDS
    five (the reference's ``unit`` / ``visit_occurrence_id`` /
    ``table_name`` / ``link_id`` fields, event_configs.yaml:30-36) —
    string-cast for a stable cross-block struct type."""

    code: F.Column
    time: F.Column
    subject_id: F.Column
    numeric_value: F.Column | None = None
    text_value: F.Column | None = None
    when: F.Column | None = None  # row emits this event only if true
    extras: dict[str, F.Column] = field(default_factory=dict)


def to_meds_events(df: DataFrame, blocks: list[EventBlock]) -> DataFrame:
    """Explode each wide row into its declared MEDS events. Output schema:
    the canonical MEDS columns plus the sorted union of every block's
    ``extras`` names (null where a block lacks one)."""
    extra_names = sorted({k for b in blocks for k in b.extras})
    structs = []
    for b in blocks:
        ev = F.struct(
            b.subject_id.cast("long").alias("subject_id"),
            b.time.cast("timestamp").alias("time"),
            b.code.cast("string").alias("code"),
            (b.numeric_value if b.numeric_value is not None else F.lit(None))
            .cast("double")
            .alias("numeric_value"),
            (b.text_value if b.text_value is not None else F.lit(None))
            .cast("string")
            .alias("text_value"),
            *[
                b.extras.get(k, F.lit(None)).cast("string").alias(k)
                for k in extra_names
            ],
        )
        structs.append(F.when(b.when, ev) if b.when is not None else F.when(F.lit(True), ev))
    arr = F.array_compact(F.array(*structs))
    return df.select(F.explode(arr).alias("ev")).select("ev.*")


# CDC → MEDS: the per-batch projection of change winners into the
# MEDS-shaped target (north star: "applied as idempotent MERGE-style
# upserts into MEDS-shaped … target tables (subject_id, time, code,
# numeric_value)"). The mapping is bijective with the CDC key — subject =
# repo (hashed to the MEDS Int64 subject_id), code = FILE//path — so
# last-writer-wins semantics carry over unchanged, and every column is
# reproducible by the pandas replay oracle (md5-based hash, seq-derived
# timestamp).
MEDS_KEY_COLS = ["subject_id", "code"]


def change_winners_to_meds(winners: DataFrame) -> DataFrame:
    """Project per-key change winners to MEDS shape, keeping the CDC
    envelope (seq_no / event_id / op) so the MEDS table merges identically."""
    from ..functions.text import md5_long

    # presence-conditional: size_bytes only exists after the schema-evolution
    # point (the reference's pattern of consulting the schema before building
    # expressions, src/OMOP_MEDS/pre_meds_utils.py:127-165)
    size = (
        F.col("size_bytes") if "size_bytes" in winners.columns else F.lit(None)
    )
    return winners.select(
        md5_long(F.col("repo")).alias("subject_id"),
        F.timestamp_seconds(F.col("seq_no")).alias("time"),
        F.concat(F.lit("FILE//"), F.col("path")).alias("code"),
        size.cast("double").alias("numeric_value"),
        F.col("content_sha256").alias("text_value"),
        F.col("seq_no"),
        F.col("event_id"),
        F.col("op"),
    )


def meds_bucket_expr_from_change(n_buckets: int) -> F.Column:
    """The MEDS table's bucket id, computed directly from change-event key
    columns (repo, path) — possible because subject_id/code are pure
    functions of them. Lets the runner collect state- and MEDS-bucket stats
    in ONE aggregation job per batch instead of two."""
    from ..functions.text import md5_long

    subject = md5_long(F.col("repo"))
    code = F.concat(F.lit("FILE//"), F.col("path"))
    return F.pmod(F.xxhash64(subject, code), F.lit(n_buckets)).cast("int")


def merge_to_cohort(events: DataFrame, n_shards: int = 32) -> DataFrame:
    """merge_to_MEDS_cohort analogue (reference configs/ETL.yaml:30):
    subject-sharded, per-subject time-sorted event stream. The repartition
    is the subject sharding (N_SUBJECTS_PER_SHARD analogue); the sort is
    within partitions only — no global order, no driver bottleneck."""
    return events.repartition(n_shards, "subject_id").sortWithinPartitions(
        "subject_id", "time", "code"
    )


def code_occurrence_counts(events: DataFrame) -> DataFrame:
    """extract_code_metadata analogue (reference utils.py:17-36 / A2):
    per-code occurrence counts with the //start|//end suffix stripped."""
    base = F.regexp_replace(F.col("code"), r"(//start|//end)$", "")
    return events.groupBy(base.alias("base_code")).agg(
        F.count("*").alias("occurrence_count"),
        F.countDistinct("subject_id").alias("n_subjects"),
    )


def subject_sorted_stream(
    events: DataFrame,
    subject_col: str = "subject_id",
    order_cols: tuple[str, ...] = ("time", "code"),
    n_shards: int = 32,
) -> DataFrame:
    """O2 with oracle-able output: deterministic subject→shard assignment
    (cross-engine md5 hash — partition-layout-invariant, unlike
    ``spark_partition_id``) plus the per-subject event position under the
    merge stage's (time, …) order. ``merge_to_cohort`` is the physical
    twin (repartition + sortWithinPartitions); this one materializes the
    logical order as data so it can be verified row-for-row."""
    from pyspark.sql import Window as W

    from ..functions.text import md5_long

    shard = F.pmod(md5_long(F.col(subject_col).cast("string")), F.lit(n_shards)).cast("int")
    w = W.partitionBy(subject_col).orderBy(*[F.col(c) for c in order_cols])
    return events.withColumn("shard_id", shard).withColumn(
        "pos", F.row_number().over(w).cast("long")
    )
