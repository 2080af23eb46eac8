"""Reference-golden NLP parity (verdict item 8).

Pins the ``*_ref`` feature variants to the reference's exact published
golden values (reference: tests/test_nlp_feature_extraction.py:36-46 over
tests/demo_resources/note.csv note_text, semantics
src/OMOP_MEDS/pre_meds_utils.py:983-1051), and quantifies exactly where the
engine's primary definitions diverge.

The reference rounds avg_word_length to 2 and lexical_diversity to 3 at
presentation time with Python ``round`` (half-even); the _ref columns are
full precision, so the test applies the same ``round`` before comparing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# the five demo note texts the reference goldens are computed over
NOTES = [
    (1, "Patient reports headache."),
    (2, "No chest pain today."),
    (3, "Follow up in 2 weeks."),
    (4, "Symptoms improved after treatment."),
    (5, "Patient referred to cardiology."),
]

# reference-published goldens (tests/test_nlp_feature_extraction.py:43-46)
GOLD_WORD_COUNT = [3, 4, 5, 4, 4]
GOLD_CHAR_COUNT = [25, 20, 21, 34, 31]
GOLD_LEX_DIV = [1.0, 1.0, 1.0, 1.0, 1.0]
# derived via the reference formulas (pre_meds_utils.py:1016-1030)
GOLD_SENTENCES = [1, 1, 1, 1, 1]
GOLD_AVG_WORD_LEN = [7.33, 4.0, 3.2, 7.5, 6.75]
GOLD_AVG_SENT_LEN = [3.0, 4.0, 5.0, 4.0, 4.0]


def _features(spark, rows):
    from omop_meds_spark.functions.text import text_features_ref

    df = spark.createDataFrame(rows, "note_id long, text string")
    out = df.select("note_id", *text_features_ref(F.col("text"))).orderBy("note_id")
    return out.collect()


def test_reference_goldens_reproduced(spark):
    got = _features(spark, NOTES)
    assert [r["word_count"] for r in got] == GOLD_WORD_COUNT
    assert [r["char_count"] for r in got] == GOLD_CHAR_COUNT
    assert [round(r["lexical_diversity_ref"], 3) for r in got] == GOLD_LEX_DIV
    assert [r["sentence_count_ref"] for r in got] == GOLD_SENTENCES
    assert [round(r["avg_word_length_ref"], 2) for r in got] == GOLD_AVG_WORD_LEN
    assert [round(r["avg_sentence_length_ref"], 2) for r in got] == GOLD_AVG_SENT_LEN


def test_null_and_empty_text_zero_features(spark):
    """Reference coerces None/empty text to all-zero features
    (pre_meds_utils.py:996-1008)."""
    got = _features(spark, [(1, None), (2, ""), (3, "   ")])
    for r in got:
        assert r["word_count"] == 0
        assert r["sentence_count_ref"] == 0
        assert r["avg_word_length_ref"] == 0.0
        assert r["avg_sentence_length_ref"] == 0.0
        assert r["unique_word_count_ref"] == 0
        assert r["lexical_diversity_ref"] == 0.0


def test_divergence_from_primary_definitions_quantified(spark):
    """The engine's primary block counts terminator RUNS (sentence_count)
    and nonspace-chars/words (avg_word_length). Pin a case where they
    differ from the reference semantics so the delta is explicit."""
    from omop_meds_spark.functions.text import (
        avg_word_length,
        avg_word_length_ref,
        sentence_count,
        sentence_count_ref,
    )

    # "Wait... what?! Ok" — terminator runs: '...'+'?!' = 2; reference
    # chunks: 'Wait', ' what', ' Ok' = 3 non-empty chunks
    df = spark.createDataFrame([("Wait... what?! Ok",)], "text string")
    r = df.select(
        sentence_count(F.col("text")).alias("runs"),
        sentence_count_ref(F.col("text")).alias("chunks"),
        avg_word_length(F.col("text")).alias("awl"),
        avg_word_length_ref(F.col("text")).alias("awl_ref"),
    ).collect()[0]
    assert r["runs"] == 2 and r["chunks"] == 3
    # primary: nonspace chars (7+6+2=15)/3; reference strips .!? → (4+4+2=10)/3
    assert abs(r["awl"] - 15 / 3) < 1e-12
    assert abs(r["awl_ref"] - 10 / 3) < 1e-12


def test_wide_punctuation_class(spark):
    from omop_meds_spark.functions.text import punctuation_count, punctuation_count_ref

    df = spark.createDataFrame([('He said "hi" - (yes)\'s.',)], "text string")
    r = df.select(
        punctuation_count(F.col("text")).alias("narrow"),
        punctuation_count_ref(F.col("text")).alias("wide"),
    ).collect()[0]
    # narrow class [.,!?;:\-()] = - ( ) . → 4; wide adds " " ' → 7
    assert r["narrow"] == 4 and r["wide"] == 7
