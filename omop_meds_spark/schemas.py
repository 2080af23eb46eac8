"""Declared schemas for the CDC engine.

The reference disables all schema inference and applies declared schemas at
scan time (reference: src/OMOP_MEDS/pre_meds_data_loader.py:40-67,
``infer_schema=False`` + ``schema_overrides``). We do the same: every source
is read with an explicit StructType; inference is never used.

Schemas:

* ``SOURCE_SCHEMA`` — the Iceberg-style source table of code repositories,
  per BASELINE.json input_hint: (repo, path, commit, lang, content).
* ``CHANGE_EVENT_SCHEMA_V{0,1,2}`` — the WAL event envelope around the
  source row, in its three evolution stages (v1 adds ``size_bytes``,
  v2 renames ``lang`` → ``language``) mirroring the reference's
  added/renamed-OMOP-column machinery (pre_meds_data_loader.py:341-507).
* ``TARGET_STATE_SCHEMA`` — the upserted state kept by the engine
  (source columns + CDC bookkeeping + content sha256).
* ``MEDS_EVENT_SCHEMA`` — the MEDS v0.4 event shape the reference emits
  (reference: configs/event_configs.yaml:1-169): subject_id / time / code /
  numeric_value (+ text_value extension).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Source table (BASELINE.json input_hint)
# --------------------------------------------------------------------------
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Key columns: one logical row per (repo, path); CDC upserts are keyed here.
KEY_COLS = ["repo", "path"]

# CDC envelope bookkeeping columns.
SEQ_COL = "seq_no"  # total order within the WAL (binlog position)
OP_COL = "op"  # I / U / D
EVENT_ID_COL = "event_id"  # globally unique per logical event; duplicated on redelivery

_ENVELOPE_FIELDS = [
    T.StructField(SEQ_COL, T.LongType(), False),
    T.StructField(EVENT_ID_COL, T.StringType(), False),
    T.StructField(OP_COL, T.StringType(), False),
]

CHANGE_EVENT_SCHEMA_V0 = T.StructType(_ENVELOPE_FIELDS + list(SOURCE_SCHEMA.fields))

# v1: schema evolution — new column appears mid-stream.
CHANGE_EVENT_SCHEMA_V1 = T.StructType(
    CHANGE_EVENT_SCHEMA_V0.fields + [T.StructField("size_bytes", T.LongType(), True)]
)

# v2: rename lang -> language (the "renamed OMOP column" analogue).
CHANGE_EVENT_SCHEMA_V2 = T.StructType(
    [
        f if f.name != "lang" else T.StructField("language", T.StringType(), True)
        for f in CHANGE_EVENT_SCHEMA_V1.fields
    ]
)

# Rename map applied by the schema registry: incoming-name -> canonical-name.
CANONICAL_RENAMES = {"language": "lang"}

# --------------------------------------------------------------------------
# Target state table (what the snapshot table stores)
# --------------------------------------------------------------------------
CONTENT_HASH_COL = "content_sha256"

TARGET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField(CONTENT_HASH_COL, T.StringType(), True),
        T.StructField(SEQ_COL, T.LongType(), False),
        T.StructField(OP_COL, T.StringType(), False),
    ]
)

# --------------------------------------------------------------------------
# MEDS event table (MEDS v0.4; reference configs/event_configs.yaml)
# --------------------------------------------------------------------------
MEDS_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("subject_id", T.LongType(), True),
        T.StructField("time", T.TimestampType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("numeric_value", T.DoubleType(), True),
        T.StructField("text_value", T.StringType(), True),
    ]
)
