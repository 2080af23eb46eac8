"""Config-contract tests for the YAML event-conversion loader — pins the
syntax the reference's event_configs.yaml uses ($col refs, f-string code
templates, null time for static events, bare literals, $table_name
injection, passthrough extras, runtime table pruning), mirroring the
reference's tests/test_dependency_upgrade_config.py role."""

from __future__ import annotations

from pathlib import Path

import pytest

from omop_meds_spark.event_config import (
    EventConfigError,
    events_from_config,
    load_event_config,
    prune_tables,
)

REF_CFG = Path("/root/reference/src/OMOP_MEDS/configs/event_configs.yaml")


def _write(tmpdir_path, text):
    p = Path(tmpdir_path) / "cfg.yaml"
    p.write_text(text)
    return p


CFG = """
subject_id_col: person_id

person:
  birth:
    code: MEDS_BIRTH
    time: $birth_date
  gender:
    code: 'f"GENDER//{$gender}"'
    time: null
    table_name: $table_name

measurement:
  measurement:
    code: 'f"{$vocab}//{$concept}"'
    time: $measured_at
    numeric_value: $value_as_number
    unit: $unit_id
    table_name: $table_name
"""


def test_full_syntax_round_trip(spark, tmpdir_path):
    cfg = load_event_config(_write(tmpdir_path, CFG))
    assert cfg.subject_id_col == "person_id"
    assert cfg.table_names() == ["person", "measurement"]

    person = spark.createDataFrame(
        [(1, "2001-03-04 00:00:00", "F"), (2, None, None)],
        "person_id long, birth_date string, gender string",
    )
    rows = {
        (r["code"], str(r["time"]), r["subject_id"], r["table_name"])
        for r in events_from_config(person, cfg, "person").collect()
    }
    # bare literal code + $col time; f-string code + null time; null
    # component -> null code (concat semantics), table_name injected
    assert ("MEDS_BIRTH", "2001-03-04 00:00:00", 1, None) in rows
    assert ("GENDER//F", "None", 1, "person") in rows
    assert ("MEDS_BIRTH", "None", 2, None) in rows
    assert (None, "None", 2, "person") in rows

    meas = spark.createDataFrame(
        [(7, "LOINC", "8480-6", "2020-01-01 10:00:00", 120.5, "mmHg")],
        "person_id long, vocab string, concept string, measured_at string, "
        "value_as_number double, unit_id string",
    )
    out = events_from_config(meas, cfg, "measurement").collect()[0]
    assert out["code"] == "LOINC//8480-6"
    assert out["numeric_value"] == 120.5
    assert out["unit"] == "mmHg" and out["table_name"] == "measurement"


def test_pruning_mirrors_reference(tmpdir_path):
    cfg = load_event_config(_write(tmpdir_path, CFG))
    pruned, removed = prune_tables(cfg, {"person"})
    assert removed == ["measurement"]
    assert pruned.table_names() == ["person"]
    assert pruned.subject_id_col == "person_id"


def test_contract_violations_fail_fast(spark, tmpdir_path):
    with pytest.raises(EventConfigError, match="subject_id_col"):
        load_event_config(_write(tmpdir_path, "person:\n  e:\n    code: X\n    time: null\n"))
    with pytest.raises(EventConfigError, match="'code'"):
        load_event_config(
            _write(tmpdir_path, "subject_id_col: s\nperson:\n  e:\n    time: null\n")
        )
    with pytest.raises(EventConfigError, match="'time'"):
        load_event_config(
            _write(tmpdir_path, "subject_id_col: s\nperson:\n  e:\n    code: X\n")
        )
    # unknown $col reference fails at compile, driver-side
    cfg = load_event_config(_write(tmpdir_path, CFG))
    person = spark.createDataFrame([(1,)], "person_id long")
    with pytest.raises(EventConfigError, match="birth_date"):
        events_from_config(person, cfg, "person")
    # missing subject column
    meas = spark.createDataFrame([("LOINC",)], "vocab string")
    with pytest.raises(EventConfigError, match="person_id"):
        events_from_config(meas, cfg, "measurement")


@pytest.mark.skipif(not REF_CFG.exists(), reason="reference checkout absent")
def test_reference_event_config_parses_and_compiles(spark):
    """The loader accepts the reference's real config verbatim
    (reference: configs/event_configs.yaml:1-169) and compiles a table's
    blocks against a schema carrying the referenced columns."""
    cfg = load_event_config(REF_CFG)
    assert cfg.subject_id_col == "person_id"
    assert {"person", "measurement", "visit_occurrence", "note"} <= set(cfg.table_names())
    meas = spark.createDataFrame(
        [(5, "LOINC", "Heart rate", "2020-02-02 00:00:00", 61.0, 8867, 33)],
        "person_id long, preferred_vocabulary_name string, "
        "preferred_concept_name string, measurement_datetime string, "
        "value_as_number double, unit_concept_id long, visit_occurrence_id long",
    )
    out = events_from_config(meas, cfg, "measurement").collect()[0]
    assert out["code"] == "LOINC//Heart rate"
    assert out["numeric_value"] == 61.0
    assert out["unit"] == "8867" and out["table_name"] == "measurement"


def test_malformed_fstring_placeholder_fails_fast(spark, tmpdir_path):
    """A brace that is not part of a {$word} placeholder must raise at
    compile — not pass through as literal text into every emitted code
    (bare $col typos already fail fast; the f-string syntax must too)."""
    cfg = load_event_config(_write(
        tmpdir_path,
        'subject_id_col: person_id\n'
        'person:\n'
        '  e:\n'
        '    code: \'f"GENDER//{$my-col}"\'\n'
        '    time: null\n',
    ))
    person = spark.createDataFrame([(1, "F")], "person_id long, gender string")
    with pytest.raises(EventConfigError, match="malformed placeholder"):
        events_from_config(person, cfg, "person")
