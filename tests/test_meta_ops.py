"""J7 (parent codes), J8 (care-site degrade), O2 (merge/sort stage), and
the finalize stage (subject splits + metadata artifacts).

Reference semantics pinned here:
* extract_codes_metadata — one row per 'Maps to' relationship, parent as a
  single-element list, null-safe (reference pre_meds_utils.py:574-676);
* join_parent_codes — the aggregated variant (sorted de-duplicated set);
* care_site degrade — missing dimension ⇒ name column = id values
  (reference pre_meds.py:252-283);
* merge_to_cohort — subject co-location + intra-partition (subject, time)
  order (reference configs/ETL.yaml:30);
* finalize — metadata/{dataset.json, codes.parquet,
  subject_splits.parquet} exist and splits are partition-invariant
  (reference tests/e2e_demo_test.py:61-87).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F


def _concepts(spark):
    rows = [
        (1, "SNOMED", "Headache", "HA-1"),
        (2, "ICD10", "Migraine", "G43"),
        (3, "LOINC", "Glucose", "GLU"),
        (4, "RxNorm", "Aspirin", "ASA"),
    ]
    return spark.createDataFrame(
        rows, "concept_id long, vocabulary_id string, concept_name string, concept_code string"
    )


def _rels(spark):
    rows = [
        (1, 2, "Maps to"),       # resolving parent
        (1, 3, "Maps to"),       # second parent for the same concept
        (2, 99, "Maps to"),      # parent id not in concept → null parent
        (3, 4, "Subsumes"),      # wrong relationship → filtered out
        (1, 2, "Maps to"),       # duplicate relationship row
    ]
    return spark.createDataFrame(
        rows, "concept_id_1 long, concept_id_2 long, relationship_id string"
    )


def test_extract_codes_metadata_reference_semantics(spark):
    from omop_meds_spark.operators.joins import extract_codes_metadata

    out = extract_codes_metadata(_concepts(spark), _rels(spark))
    rows = {(r["concept_id"], tuple(r["parent_codes"]) if r["parent_codes"] else None)
            for r in out.collect()}
    got = sorted(out.collect(), key=lambda r: (r["concept_id"], str(r["parent_codes"])))
    # concept 1: THREE rows (two distinct parents + the duplicate rel row)
    c1 = [r for r in got if r["concept_id"] == 1]
    assert len(c1) == 3
    assert sorted(tuple(r["parent_codes"]) for r in c1) == [
        ("ICD10//G43",), ("ICD10//G43",), ("LOINC//GLU",)
    ]
    assert all(r["code"] == "SNOMED//1" and r["description"] == "Headache" for r in c1)
    # concept 2: one row, relationship target unknown → null parents
    c2 = [r for r in got if r["concept_id"] == 2]
    assert len(c2) == 1 and c2[0]["parent_codes"] is None
    # concepts 3, 4: no 'Maps to' rels → single row, null parents
    assert (3, None) in rows and (4, None) in rows
    assert out.count() == 6


def test_join_parent_codes_aggregated_set_semantics(spark):
    from omop_meds_spark.operators.joins import join_parent_codes

    out = join_parent_codes(_concepts(spark), _rels(spark))
    by_id = {r["concept_id"]: r for r in out.collect()}
    # one row per concept; parents sorted + de-duplicated
    assert out.count() == 4
    assert by_id[1]["parent_codes"] == ["ICD10//G43", "LOINC//GLU"]
    # unknown parent target: the inner join against the concept dim drops
    # the rel row entirely → no parents row → null (pinned: differs from
    # extract_codes_metadata, which keeps a null-parent row per rel)
    assert by_id[2]["parent_codes"] is None
    assert by_id[3]["parent_codes"] is None  # no 'Maps to' rels at all
    assert by_id[4]["parent_codes"] is None


def test_care_site_enrich_join_and_degrade(spark):
    from omop_meds_spark.operators.joins import care_site_enrich

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)],
        "visit_id long, care_site_id long",
    )
    dim = spark.createDataFrame(
        [(10, "Main Clinic"), (20, "North Ward")],
        "care_site_id long, care_site_name string",
    )
    joined = {r["visit_id"]: r["care_site_name"] for r in care_site_enrich(fact, dim).collect()}
    assert joined == {1: "Main Clinic", 2: "North Ward", 3: None, 4: None}

    degraded = care_site_enrich(fact, None)
    vals = {r["visit_id"]: r["care_site_name"] for r in degraded.collect()}
    assert vals == {1: 10, 2: 20, 3: 99, 4: None}  # name column = id values


def test_merge_to_cohort_colocation_and_order(spark):
    from omop_meds_spark.operators.meds import merge_to_cohort

    rows = [(s, float(t), f"C//{t % 3}") for s in range(40) for t in range(25)]
    ev = spark.createDataFrame(rows, "subject_id long, time double, code string")
    ev = ev.orderBy(F.rand(seed=7))  # scramble input order
    merged = merge_to_cohort(ev, n_shards=8)
    tagged = merged.withColumn("pid", F.spark_partition_id()).collect()

    part_of: dict[int, set[int]] = {}
    seen: dict[int, list] = {}
    for r in tagged:
        part_of.setdefault(r["subject_id"], set()).add(r["pid"])
        seen.setdefault(r["pid"], []).append((r["subject_id"], r["time"], r["code"]))
    # each subject lives in exactly one partition
    assert all(len(p) == 1 for p in part_of.values())
    # rows arrive sorted within each partition
    for rows_ in seen.values():
        assert rows_ == sorted(rows_)


def test_subject_sorted_stream_positions(spark):
    from omop_meds_spark.operators.meds import subject_sorted_stream

    ev = spark.createDataFrame(
        [(1, 5.0, "b"), (1, 5.0, "a"), (1, 1.0, "z"), (2, 3.0, "x")],
        "subject_id long, time double, code string",
    )
    out = subject_sorted_stream(ev, "subject_id", ("time", "code"), n_shards=4)
    got = {(r["subject_id"], r["time"], r["code"]): (r["pos"], r["shard_id"])
           for r in out.collect()}
    assert got[(1, 1.0, "z")][0] == 1
    assert got[(1, 5.0, "a")][0] == 2
    assert got[(1, 5.0, "b")][0] == 3
    assert got[(2, 3.0, "x")][0] == 1
    # all events of a subject share one shard
    assert got[(1, 1.0, "z")][1] == got[(1, 5.0, "a")][1] == got[(1, 5.0, "b")][1]


def test_finalize_metadata_artifacts_and_split_determinism(spark, tmpdir_path):
    from omop_meds_spark.operators.finalize import assign_splits, finalize_metadata

    ev = spark.createDataFrame(
        [(i % 500, float(i), f"CODE//{i % 7}") for i in range(3000)],
        "subject_id long, time double, code string",
    )
    meta = finalize_metadata(ev, tmpdir_path, "synthetic_demo", "1.0")
    meta_dir = Path(tmpdir_path) / "metadata"
    assert (meta_dir / "dataset.json").exists()
    assert (meta_dir / "codes.parquet").exists()
    assert (meta_dir / "subject_splits.parquet").exists()
    on_disk = json.loads((meta_dir / "dataset.json").read_text())
    assert on_disk["dataset_name"] == "synthetic_demo" and on_disk["meds_version"] == "0.4"

    splits = spark.read.parquet(str(meta_dir / "subject_splits.parquet"))
    assert splits.count() == 500  # one row per distinct subject
    names = {r["split"] for r in splits.select("split").distinct().collect()}
    assert names <= {"train", "tuning", "held_out"} and "train" in names
    # rough proportions (hash split, 500 subjects)
    n_train = splits.filter(F.col("split") == "train").count()
    assert 320 <= n_train <= 480

    # partition-layout invariance: shuffled + repartitioned input assigns
    # identically
    again = assign_splits(ev.orderBy(F.rand(seed=3)).repartition(13))
    base = {(r["subject_id"], r["split"]) for r in splits.collect()}
    assert {(r["subject_id"], r["split"]) for r in again.collect()} == base


def test_custom_concept_threshold(spark):
    """P6: the >2e9 custom-concept gate."""
    from omop_meds_spark.functions.codes import is_custom_concept

    df = spark.createDataFrame(
        [(8507,), (2_000_000_000,), (2_000_039_197,), (None,)], "concept_id long"
    )
    got = [r["c"] for r in df.select(is_custom_concept("concept_id").alias("c")).collect()]
    assert got == [False, False, True, None]
