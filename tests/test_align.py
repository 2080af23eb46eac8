"""Schema registry: widening ladder, alignment, renames, evolution.

Semantics mirrored from the reference's resolve_target_schema /
_resolve_conflict / _align_shard_to_schema
(reference: src/OMOP_MEDS/pre_meds_data_loader.py:341-507).
"""

from __future__ import annotations

from pyspark.sql import types as T

from omop_meds_spark.plans.align import SchemaRegistry, widen


def test_widen_ladder():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.ShortType()) == T.LongType()
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.DecimalType(10, 2), T.LongType()) == T.DoubleType()
    assert widen(T.FloatType(), T.DecimalType(10, 2)) == T.DoubleType()
    assert widen(T.DateType(), T.TimestampType()) == T.TimestampType()
    assert widen(T.StringType(), T.LongType()) == T.StringType()
    assert widen(T.BooleanType(), T.LongType()) == T.StringType()
    assert widen(T.StringType(), T.StringType()) == T.StringType()


def _reg():
    return SchemaRegistry(
        target=T.StructType(
            [
                T.StructField("a", T.LongType(), True),
                T.StructField("b", T.StringType(), True),
            ]
        ),
        renames={"b_new": "b"},
    )


def test_align_missing_and_cast(spark):
    reg = _reg()
    df = spark.createDataFrame([("1",)], "a string")  # missing b; a needs cast
    out = reg.align(df)
    assert out.schema == reg.target
    row = out.collect()[0]
    assert row["a"] == 1 and row["b"] is None


def test_align_bad_cast_is_null(spark):
    reg = _reg()
    df = spark.createDataFrame([("not_a_number",)], "a string")
    assert reg.align(df).collect()[0]["a"] is None  # try_cast, never raises


def test_align_rename_and_case(spark):
    reg = _reg()
    df = spark.createDataFrame([(1, "x")], "A long, B_NEW string")
    row = reg.align(df).collect()[0]
    assert row["a"] == 1 and row["b"] == "x"


def test_evolve_adopts_and_widens():
    reg = _reg()
    changed = reg.evolve(
        T.StructType(
            [
                T.StructField("a", T.DoubleType(), True),  # widen long -> double
                T.StructField("c", T.LongType(), True),  # new column adopted
            ]
        )
    )
    assert changed and reg.version == 1
    assert reg.target["a"].dataType == T.DoubleType()
    assert reg.target["c"].dataType == T.LongType()
    # idempotent: same schema again is a no-op
    assert not reg.evolve(T.StructType([T.StructField("c", T.LongType(), True)]))
    assert reg.version == 1


def test_evolve_rename_is_not_new_column():
    reg = _reg()
    assert not reg.evolve(T.StructType([T.StructField("b_new", T.StringType(), True)]))
    assert reg.version == 0
