"""Multi-format declared-schema loader (reference S1-S8 semantics)."""

from __future__ import annotations

import gzip
from pathlib import Path

import pytest
from pyspark.sql import types as T

from omop_meds_spark.sources.loader import (
    col_selector,
    estimate_rows,
    load_table,
    resolve_table_path,
)

SCHEMA = T.StructType(
    [
        T.StructField("person_id", T.LongType()),
        T.StructField("value_as_number", T.DoubleType()),
        T.StructField("note_text", T.StringType()),
    ]
)

CSV = "PERSON_ID,VALUE_AS_NUMBER,NOTE_TEXT\n1,2.5,hello\n2,,world\n3,9.0,\n"


def _write_csv(d: Path) -> Path:
    fp = d / "note.csv"
    fp.write_text(CSV)
    return fp


def test_csv_declared_schema_lowercase(spark, tmpdir_path):
    fp = _write_csv(Path(tmpdir_path))
    df = load_table(spark, fp, SCHEMA)
    assert df.columns == ["person_id", "value_as_number", "note_text"]
    assert [f.dataType for f in df.schema.fields] == [
        T.LongType(), T.DoubleType(), T.StringType()]
    rows = {r["person_id"]: r for r in df.collect()}
    assert rows[2]["value_as_number"] is None
    assert rows[1]["note_text"] == "hello"


def test_gzip_csv(spark, tmpdir_path):
    fp = Path(tmpdir_path) / "note.csv.gz"
    with gzip.open(fp, "wt") as f:
        f.write(CSV)
    df = load_table(spark, fp, SCHEMA)
    assert df.count() == 3


def test_shard_directory_csv(spark, tmpdir_path):
    d = Path(tmpdir_path) / "note"
    d.mkdir()
    (d / "000000.csv").write_text(CSV)
    (d / "000001.csv").write_text(CSV)
    df = load_table(spark, d, SCHEMA)
    assert df.count() == 6


def test_parquet_permissive_align(spark, tmpdir_path):
    """Parquet shard with extra + missing + int-typed columns aligns to the
    declared schema: extra dropped, missing -> null, int -> double cast."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = Path(tmpdir_path) / "m.parquet"
    pq.write_table(
        pa.table({"PERSON_ID": [7], "VALUE_AS_NUMBER": [4], "xtn_etl_junk": ["x"]}), d
    )
    df = load_table(spark, d, SCHEMA)
    assert df.columns == ["person_id", "value_as_number", "note_text"]
    r = df.collect()[0]
    assert r["value_as_number"] == 4.0 and r["note_text"] is None


def test_selectors_and_resolution(spark, tmpdir_path):
    d = Path(tmpdir_path)
    _write_csv(d)
    assert resolve_table_path(d, "note").name == "note.csv"
    assert resolve_table_path(d, "missing") is None
    df = load_table(spark, d / "note.csv", SCHEMA, select_patterns=[r"^person", r"^note"])
    assert df.columns == ["person_id", "note_text"]
    df2 = load_table(spark, d / "note.csv", SCHEMA, drop_patterns=[r"^note_"])
    assert df2.columns == ["person_id", "value_as_number"]
    with pytest.raises(ValueError):
        col_selector(["a", "b"], names=["zz"])


def test_estimate_rows(tmpdir_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = Path(tmpdir_path) / "sh"
    d.mkdir()
    for i in range(3):
        pq.write_table(pa.table({"x": list(range(10))}), d / f"{i}.parquet")
    assert estimate_rows(d) == 30


def test_csv_binds_columns_by_name_not_position(spark, tmpdir_path):
    """ADVICE: a shard whose column order differs from the declared schema
    must load by header name (the reference binds via schema_overrides)."""
    from pathlib import Path

    from pyspark.sql import types as T

    shard_dir = Path(tmpdir_path) / "people"
    shard_dir.mkdir()
    (shard_dir / "000000.csv").write_text("person_id,name,score\n1,alice,9.5\n")
    # reordered header + an extra column in the second shard
    (shard_dir / "000001.csv").write_text("score,person_id,extra,name\n2.5,2,x,bob\n")
    schema = T.StructType(
        [
            T.StructField("person_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = load_table(spark, shard_dir, schema)
    assert df.columns == ["person_id", "name", "score"]
    got = {(r["person_id"], r["name"], r["score"]) for r in df.collect()}
    assert got == {(1, "alice", 9.5), (2, "bob", 2.5)}
