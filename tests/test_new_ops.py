"""Semantics tests for the chunking / funnel / fuzzy-join operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from omop_meds_spark.operators.chunking import chunk_documents
from omop_meds_spark.operators.joins import fuzzy_token_join
from omop_meds_spark.operators.temporal import funnel_match


def test_chunking_overlap_and_tail(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_chars=4, stride=3).collect(),
        key=lambda r: r.chunk_idx)
    # starts 0,3,6,9; final chunk is the tail remainder
    assert [(r.chunk_idx, r.chunk_start, r.chunk_text) for r in rows] == [
        (0, 0, "abcd"), (1, 3, "defg"), (2, 6, "ghij"), (3, 9, "j")]


def test_chunking_empty_text_kept(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_chars=4, stride=3).collect()
    assert len(rows) == 1 and rows[0].chunk_text == "" and rows[0].chunk_idx == 0


def test_funnel_strict_order_and_ties(spark):
    t0 = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1 converts: A@0 B@1 C@2
        (1, t0, 10, "A"), (1, t0 + s, 11, "B"), (1, t0 + 2 * s, 12, "C"),
        # u2: B before A -> no conversion (B@0, A@1, C@2 but no B after A)
        (2, t0, 20, "B"), (2, t0 + s, 21, "A"), (2, t0 + 2 * s, 22, "C"),
        # u3: tie — B at the SAME ts as A is rejected (strict >)
        (3, t0, 30, "A"), (3, t0, 31, "B"), (3, t0 + s, 32, "C"),
        # u4: A@0 B@1 C@2 with a second earlier B@0 (before A) ignored;
        #     min qualifying B is @1
        (4, t0, 40, "B"), (4, t0, 41, "A"), (4, t0 + s, 42, "B"),
        (4, t0 + 2 * s, 43, "C"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    out = {r.user_id: r for r in funnel_match(ev, ["A", "B", "C"]).collect()}
    assert set(out) == {1, 4}
    assert out[1].step1_ts == t0 and out[1].step2_ts == t0 + s
    assert out[4].step1_ts == t0 and out[4].step2_ts == t0 + s \
        and out[4].step3_ts == t0 + 2 * s


def test_funnel_reuses_c_only_after_b(spark):
    t0 = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    # C exists but only BEFORE B completes -> not converted
    rows = [(1, t0, 1, "A"), (1, t0 + s, 2, "C"), (1, t0 + 2 * s, 3, "B")]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    assert funnel_match(ev, ["A", "B", "C"]).count() == 0


def test_fuzzy_token_join_semantics(spark):
    toks = spark.createDataFrame(
        [("join",), ("join",), ("scan",), ("table",), ("zzzzzz",)], ["token"])
    cat = spark.createDataFrame([("joyn",), ("skan",), ("tabel",)], ["canonical"])
    got = {(r.token, r.canonical, r.dist)
           for r in fuzzy_token_join(toks, cat, max_dist=1).collect()}
    # duplicates collapse via the dictionary distinct; lev(join,joyn)=1,
    # lev(scan,skan)=1, lev(table,tabel)=1 (transposition = 2 edits? no:
    # delete+insert = 2 — so table/tabel is DISTANCE 2 and must be absent)
    assert ("join", "joyn", 1) in got
    assert ("scan", "skan", 1) in got
    assert all(tok != "zzzzzz" for tok, _, _ in got)
    assert all(d <= 1 for _, _, d in got)
