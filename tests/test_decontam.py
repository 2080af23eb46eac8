"""Decontamination + repetition-gate semantics (operators/decontam.py,
functions/text.repetition_features)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omop_meds_spark.functions.text import repetition_features
from omop_meds_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
    ngrams_strict_col,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strict_ngrams_empty_below_n(spark):
    df = spark.range(1).select(
        ngrams_strict_col(F.lit("a b"), 3).alias("g3"),
        ngrams_strict_col(F.lit("a b c d"), 3).alias("g3b"),
    )
    row = df.first()
    assert row["g3"] == []
    assert row["g3b"] == ["a b c", "b c d"]


def test_contamination_hits_counts_distinct_eval_grams(spark):
    eval_df = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            # contains "the quick brown" and "quick brown fox" → 2 hits
            (1, "say the quick brown fox runs"),
            # repeats one eval gram twice → still 1 DISTINCT hit
            (2, "brown fox jumps and brown fox jumps"),
            (3, "completely unrelated words here"),
            (4, "too short"),  # < n tokens → no grams, never flagged
        ],
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(train, eval_df, n=3).collect()
    }
    assert got == {1: 2, 2: 1}

    kept = {r["doc_id"] for r in decontaminate(train, eval_df, n=3).collect()}
    assert kept == {3, 4}


def test_contamination_plan_broadcasts_eval_grams(spark):
    eval_df = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(spark, [(1, "say the quick brown fox runs")])
    plan = (
        contamination_hits(train, eval_df, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repetition_features_hand_cases(spark):
    df = _docs(
        spark,
        [
            (1, "a a a b"),          # 4 words, 2 distinct, top=a(3), 3 2-grams ("a a" x2)
            (2, "x y z"),            # all unique
            (3, "w"),                # single word: no 2-grams
            (4, ""),                 # empty: all zeros
        ],
    ).select("doc_id", *repetition_features(F.col("text")))
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == 0.5
    assert got[1]["top_word_frac"] == 0.75
    assert got[1]["dup_2gram_frac"] == 1.0 / 3.0
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_word_frac"] == 1.0 / 3.0
    assert got[3]["n_words"] == 1 and got[3]["dup_2gram_frac"] == 0.0
    assert got[4]["n_words"] == 0 and got[4]["top_word_frac"] == 0.0
