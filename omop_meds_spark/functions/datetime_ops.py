"""Datetime resolution functions (reference F1-F7).

Pure Column algebra — no UDFs — re-expressing the reference's datetime
machinery (src/OMOP_MEDS/pre_meds_utils.py:21-172, 250-296; spec'd by its
685-line tests/test_build_preferred_event_datetime.py):

* multi-format permissive parse (F1) — ``try_to_timestamp`` coalesce,
* type-dispatched cast (F2) — dispatch on the *schema*, not the data,
* end-of-day promotion for date-only values (F3, anti-leakage: a date-only
  event happened *some time* that day, so it must not sort before same-day
  timestamped events),
* the preferred-event-datetime resolver (F4): coalesce(primary datetimes,
  end-of-day(primary dates)); an override column wins iff non-null AND
  strictly later; absent columns are skipped; nothing configured → typed
  null. Output always TimestampType (µs), aliased ``preferred_time``,
* sentinel-repairing date construction (F5): year 0 → 1800, year null →
  1900, month/day 0 or null → 1 (the 0→1800 vs null→1900 asymmetry is
  intentional in the reference, pre_meds_utils.py:250-255),
* birth/death datetime preference chains (F6/F7).

All functions are presence-conditional: they inspect ``df.columns`` /
``df.schema`` and build null literals for absent columns — identical to the
reference's schema-conditional expression building (pre_meds_utils.py:127-165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TS_FORMATS = ("yyyy-MM-dd HH:mm:ss[.SSSSSS]", "yyyy-MM-dd")


def parse_time(col: F.Column | str) -> F.Column:
    """F1: permissive multi-format string→timestamp (null on failure)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in TS_FORMATS])


def end_of_day(col: F.Column | str) -> F.Column:
    """F3: promote a date(-like) value to 23:59:59 of the same day."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp") + F.expr("INTERVAL '23:59:59' HOUR TO SECOND")


def cast_to_datetime(
    df: DataFrame, col_name: str, move_to_end_of_day: bool = False
) -> F.Column:
    """F2: type-dispatched datetime cast driven by the DataFrame schema."""
    dt = df.schema[col_name].dataType
    c = F.col(col_name)
    if isinstance(dt, T.StringType):
        parsed = parse_time(c)
        # a string that parses as date-only gets end-of-day promotion too:
        # detect "no time part" by exact date format match
        if move_to_end_of_day:
            date_only = F.try_to_timestamp(c, F.lit("yyyy-MM-dd"))
            return F.when(
                date_only.isNotNull(), end_of_day(date_only)
            ).otherwise(parsed)
        return parsed
    if isinstance(dt, T.DateType):
        return end_of_day(c) if move_to_end_of_day else c.cast("timestamp")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return c.cast("timestamp")
    return F.lit(None).cast("timestamp")


def build_preferred_event_datetime(
    df: DataFrame,
    primary_datetime_cols: list[str] = (),
    primary_date_cols: list[str] = (),
    override_datetime_col: str | None = None,
    output_col: str = "preferred_time",
) -> F.Column:
    """F4: the reference's preferred-event-datetime resolver.

    primary = coalesce(datetime cols…, end_of_day(date cols)…) over the
    columns that actually exist; override replaces primary iff non-null and
    *strictly* later. Returns a typed-null column if nothing is present.
    """
    present = set(df.columns)
    candidates = [
        cast_to_datetime(df, c) for c in primary_datetime_cols if c in present
    ] + [
        cast_to_datetime(df, c, move_to_end_of_day=True)
        for c in primary_date_cols
        if c in present
    ]
    primary = F.coalesce(*candidates) if candidates else F.lit(None).cast("timestamp")
    if override_datetime_col and override_datetime_col in present:
        ov = cast_to_datetime(df, override_datetime_col)
        primary = F.when(ov.isNotNull() & (ov > primary), ov).otherwise(primary)
    return primary.alias(output_col)


def sentinel_date(year: F.Column | str, month: F.Column | str, day: F.Column | str) -> F.Column:
    """F5: construct a timestamp with the reference's sentinel repairs:
    year 0→1800 / null→1900; month, day 0 or null → 1."""
    y, m, d = (F.col(c) if isinstance(c, str) else c for c in (year, month, day))
    return F.make_timestamp(
        F.coalesce(F.when(y == 0, F.lit(1800)).otherwise(y), F.lit(1900)).cast("int"),
        F.coalesce(F.nullif(m.cast("int"), F.lit(0)), F.lit(1)),
        F.coalesce(F.nullif(d.cast("int"), F.lit(0)), F.lit(1)),
        F.lit(0), F.lit(0), F.lit(0),
    )


def birth_datetime_preference(df: DataFrame) -> F.Column:
    """F6: birth_datetime if present+non-null, else constructed from
    year/month/day_of_birth with sentinel repair."""
    constructed = sentinel_date("year_of_birth", "month_of_birth", "day_of_birth")
    if "birth_datetime" in df.columns:
        return F.coalesce(cast_to_datetime(df, "birth_datetime"), constructed)
    return constructed


def death_datetime_fallback(df: DataFrame) -> F.Column:
    """F7: death_datetime → death_date → typed null (schema-conditional)."""
    chain = []
    if "death_datetime" in df.columns:
        chain.append(cast_to_datetime(df, "death_datetime"))
    if "death_date" in df.columns:
        chain.append(cast_to_datetime(df, "death_date"))
    if not chain:
        return F.lit(None).cast("timestamp")
    return F.coalesce(*chain) if len(chain) > 1 else chain[0]
