"""Table-driven spec for the preferred-event-datetime resolver (F1-F7).

Mirrors the reference's exhaustive spec style
(reference: tests/test_build_preferred_event_datetime.py, 18 case groups):
coalesce order, end-of-day promotion, strictly-later override, absent
columns, string parsing, sentinel date construction, birth/death chains.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from omop_meds_spark.functions.datetime_ops import (
    birth_datetime_preference,
    build_preferred_event_datetime,
    death_datetime_fallback,
    end_of_day,
    parse_time,
    sentinel_date,
)

TS = dt.datetime


def one(spark, schema: str, row: tuple, col):
    df = spark.createDataFrame([row], schema)
    return df.select(col).collect()[0][0]


# --- A-G: resolver core ----------------------------------------------------
def test_A_datetime_beats_date(spark):
    df = spark.createDataFrame(
        [(TS(2020, 1, 2, 10, 30), dt.date(2020, 1, 1))], "d_ts timestamp, d_date date"
    )
    got = df.select(
        build_preferred_event_datetime(df, ["d_ts"], ["d_date"])
    ).collect()[0][0]
    assert got == TS(2020, 1, 2, 10, 30)


def test_B_date_promoted_to_end_of_day(spark):
    df = spark.createDataFrame(
        [(None, dt.date(2020, 1, 1))], "d_ts timestamp, d_date date"
    )
    got = df.select(build_preferred_event_datetime(df, ["d_ts"], ["d_date"])).collect()[0][0]
    assert got == TS(2020, 1, 1, 23, 59, 59)


def test_C_override_strictly_later_wins(spark):
    df = spark.createDataFrame(
        [
            (1, TS(2020, 1, 1, 12), TS(2020, 1, 2, 12)),  # later → wins
            (2, TS(2020, 1, 1, 12), TS(2020, 1, 1, 12)),  # equal → primary
            (3, TS(2020, 1, 1, 12), TS(2019, 1, 1, 12)),  # earlier → primary
            (4, TS(2020, 1, 1, 12), None),                # null → primary
        ],
        "id long, d_ts timestamp, ov timestamp",
    )
    col = build_preferred_event_datetime(df, ["d_ts"], [], override_datetime_col="ov")
    got = {r["id"]: r["preferred_time"] for r in df.select("id", col).collect()}
    assert got[1] == TS(2020, 1, 2, 12)
    assert got[2] == TS(2020, 1, 1, 12)
    assert got[3] == TS(2020, 1, 1, 12)
    assert got[4] == TS(2020, 1, 1, 12)


def test_D_override_vs_null_primary(spark):
    """Override with null primary: ov > null is null → primary (null) kept.
    Pinned behavior — matches the reference's strict comparison semantics."""
    df = spark.createDataFrame([(None, TS(2020, 1, 2))], "d_ts timestamp, ov timestamp")
    got = df.select(
        build_preferred_event_datetime(df, ["d_ts"], [], override_datetime_col="ov")
    ).collect()[0][0]
    assert got is None


def test_E_absent_columns_skipped(spark):
    df = spark.createDataFrame([(dt.date(2021, 6, 1),)], "only_date date")
    got = df.select(
        build_preferred_event_datetime(
            df, ["ghost_ts"], ["only_date"], override_datetime_col="ghost_ov"
        )
    ).collect()[0][0]
    assert got == TS(2021, 6, 1, 23, 59, 59)


def test_F_nothing_configured_typed_null(spark):
    df = spark.createDataFrame([(1,)], "x long")
    out = df.select(build_preferred_event_datetime(df, ["nope"], ["nada"]))
    assert out.schema["preferred_time"].dataType.typeName() == "timestamp"
    assert out.collect()[0][0] is None


def test_G_coalesce_order_first_nonnull(spark):
    df = spark.createDataFrame(
        [(None, TS(2020, 5, 5, 5), TS(2021, 1, 1))],
        "a timestamp, b timestamp, c timestamp",
    )
    got = df.select(build_preferred_event_datetime(df, ["a", "b", "c"], [])).collect()[0][0]
    assert got == TS(2020, 5, 5, 5)


# --- H-J: parsing / casts --------------------------------------------------
def test_H_string_parse_both_formats(spark):
    assert one(spark, "s string", ("2020-03-04 05:06:07.000008",), parse_time("s")) == TS(
        2020, 3, 4, 5, 6, 7, 8
    )
    assert one(spark, "s string", ("2020-03-04",), parse_time("s")) == TS(2020, 3, 4)
    assert one(spark, "s string", ("garbage",), parse_time("s")) is None


def test_I_string_date_only_end_of_day(spark):
    df = spark.createDataFrame([("2020-03-04",)], "sd string")
    got = df.select(build_preferred_event_datetime(df, [], ["sd"])).collect()[0][0]
    assert got == TS(2020, 3, 4, 23, 59, 59)


def test_J_end_of_day_is_same_day(spark):
    assert one(spark, "d date", (dt.date(1999, 12, 31),), end_of_day("d")) == TS(
        1999, 12, 31, 23, 59, 59
    )


# --- K-M: sentinel / birth / death ----------------------------------------
@pytest.mark.parametrize(
    "y,m,d,expected",
    [
        (1985, 6, 15, TS(1985, 6, 15)),
        (0, 6, 15, TS(1800, 6, 15)),      # year 0 → 1800
        (None, 6, 15, TS(1900, 6, 15)),   # year null → 1900
        (1985, 0, 0, TS(1985, 1, 1)),     # month/day 0 → 1
        (1985, None, None, TS(1985, 1, 1)),
    ],
)
def test_K_sentinel_date(spark, y, m, d, expected):
    got = one(spark, "y long, m long, d long", (y, m, d), sentinel_date("y", "m", "d"))
    assert got == expected


def test_L_birth_preference(spark):
    df = spark.createDataFrame(
        [
            (TS(1980, 2, 3, 4), 1985, 6, 15),
            (None, 1985, 6, 15),
        ],
        "birth_datetime timestamp, year_of_birth long, month_of_birth long, day_of_birth long",
    )
    got = [r[0] for r in df.select(birth_datetime_preference(df)).collect()]
    assert got == [TS(1980, 2, 3, 4), TS(1985, 6, 15)]
    # without birth_datetime column at all
    df2 = df.drop("birth_datetime")
    got2 = df2.select(birth_datetime_preference(df2)).collect()[0][0]
    assert got2 == TS(1985, 6, 15)


def test_M_death_fallback(spark):
    df = spark.createDataFrame(
        [(None, dt.date(2001, 2, 3)), (TS(2002, 3, 4, 5), dt.date(2001, 2, 3))],
        "death_datetime timestamp, death_date date",
    )
    got = {r[0] for r in df.select(death_datetime_fallback(df)).collect()}
    assert got == {TS(2001, 2, 3), TS(2002, 3, 4, 5)}
    df2 = spark.createDataFrame([(1,)], "x long")
    assert df2.select(death_datetime_fallback(df2)).collect()[0][0] is None
