"""General conditional MERGE INTO as a single-shuffle DataFrame composition.

The engine's CDC hot path is the specialised LWW upsert (operators/upsert.py)
— the reference's implicit merge semantics (sorted dedup + last-writer-wins,
reference: src/OMOP_MEDS/pre_meds.py:214-269). This module is the GENERAL
form a lakehouse user expects from ``MERGE INTO``: arbitrary match
conditions with WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT
MATCHED INSERT branches, evaluated in caller-supplied order.

Scale shape: exactly ONE full-outer hash join on the merge keys (Catalyst
broadcasts the source side when it is small; AQE handles skewed keys), then
a pure projection — no window, no second shuffle, no driver-side rows.
Branch conditions and update expressions are Spark Columns over the ``t.``
(target) and ``s.`` (source) aliases, so everything stays inside
whole-stage codegen.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T_FLAG = "__merge_t_present"
_S_FLAG = "__merge_s_present"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    matched_delete: Column | None = None,
    matched_update: Column | None = None,
    update_set: dict[str, Column] | None = None,
    insert_when: Column | None = None,
    insert: bool = True,
) -> DataFrame:
    """Merge ``source`` into ``target`` on the ``on`` key columns.

    Row semantics (ANSI MERGE, branches tested in this order):

    * matched & ``matched_delete``           → row dropped
    * matched & ``matched_update``           → target row with ``update_set``
      expressions applied (columns absent from ``update_set`` keep the
      target value); ``update_set`` defaulting to "take every source
      column" when None
    * matched, no branch fires               → target row unchanged
    * source-only & ``insert`` [& ``insert_when``] → source row inserted
      (source must carry every target column)
    * target-only                            → target row unchanged

    Like SQL MERGE, the source must have at most one row per key — feed it
    through ``last_writer_wins`` first when it is a raw change stream.
    Conditions reference columns as ``F.col("t.<name>")`` / ``F.col("s.<name>")``.
    Matching is null-safe on the keys (``<=>``): a NULL key matches a NULL key.
    """
    out_cols = target.columns
    t = target.withColumn(_T_FLAG, F.lit(True)).alias("t")
    s = source.withColumn(_S_FLAG, F.lit(True)).alias("s")
    key_eq = functools.reduce(
        operator.and_,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on])
    j = t.join(s, key_eq, "full_outer")

    t_present = F.col(f"t.{_T_FLAG}").isNotNull()
    s_present = F.col(f"s.{_S_FLAG}").isNotNull()
    matched = t_present & s_present
    # ANSI MERGE: a branch condition that evaluates to NULL does NOT fire
    # (it is not "unknown → drop"), so every user condition is coalesced
    # to False before it can veto `keep`.
    delete_row = matched & F.coalesce(matched_delete, F.lit(False)) \
        if matched_delete is not None else F.lit(False)
    update_row = matched & ~delete_row & F.coalesce(matched_update, F.lit(False)) \
        if matched_update is not None else F.lit(False)
    insert_row = s_present & ~t_present & F.lit(insert)
    if insert_when is not None:
        insert_row = insert_row & F.coalesce(insert_when, F.lit(False))

    keep = ~delete_row & (t_present | insert_row)
    if update_set is None:
        update_set = {c: F.col(f"s.{c}") for c in out_cols}
    projected = [
        F.when(insert_row, F.col(f"s.{c}"))
        .when(update_row, update_set.get(c, F.col(f"t.{c}")))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in out_cols
    ]
    return j.filter(keep).select(*projected)
