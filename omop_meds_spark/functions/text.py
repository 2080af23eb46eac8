"""Vectorized text analytics (reference F15 + training-data-pipeline ops).

The reference computes NLP features in a per-row Python UDF returning a
struct (src/OMOP_MEDS/pre_meds_utils.py:949-1177, ``map_elements``). Per the
north rule ("no per-row Python") every feature here is JVM-side Column
algebra: regexp_extract_all / regexp_replace / array ops — whole-stage
codegen'd, and every definition is chosen to be *bit-identical* in DuckDB
SQL so each operator ships with an exact oracle.

Semantics note: the reference's ``sentence_count`` counts non-empty chunks
after splitting on ``[.!?]+``; we define it as the number of terminator runs
(equal on text that ends with a terminator). This engine's definitions are
its spec; golden tests pin exact values.

Regex dialect parity: patterns restrict to syntax that Java regex (Spark)
and RE2 (DuckDB) interpret identically — no lookaround, no backrefs; an
explicit capture group everywhere because Spark's regexp_extract_all
defaults to group 1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

WORD_RX = r"(\S+)"
ALNUM_TOKEN_RX = r"([a-z0-9]+)"
SENTENCE_RX = r"([.!?]+)"
PUNCT_RX = r"([.,!?;:\-()])"
DIGIT_RX = r"([0-9])"
UPPER_RX = r"([A-Z])"
TOKEN_RX = r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])"

# language-ID stopword regexes (distinctive words per language)
LANG_STOPWORDS = {
    "en": r"(\b(the|and|of|to|is|that|with)\b)",
    "de": r"(\b(der|die|das|und|ist|nicht|mit)\b)",
    "fr": r"(\b(le|la|les|et|est|dans|pour)\b)",
    "es": r"(\b(el|los|las|es|en|para|una)\b)",
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic tie-break order


def _c(col: F.Column | str) -> F.Column:
    return F.col(col) if isinstance(col, str) else col


def _count(col: F.Column, rx: str) -> F.Column:
    # cast to long: DuckDB's len() is BIGINT, keep oracle schemas identical
    return F.size(F.regexp_extract_all(col, F.lit(rx), F.lit(1))).cast("long")


def word_count(col) -> F.Column:
    return _count(_c(col), WORD_RX)


def char_count(col) -> F.Column:
    return F.length(_c(col)).cast("long")


def sentence_count(col) -> F.Column:
    return _count(_c(col), SENTENCE_RX)


def punctuation_count(col) -> F.Column:
    return _count(_c(col), PUNCT_RX)


def digit_count(col) -> F.Column:
    return _count(_c(col), DIGIT_RX)


def uppercase_count(col) -> F.Column:
    return _count(_c(col), UPPER_RX)


def unique_word_count(col) -> F.Column:
    return F.size(
        F.array_distinct(F.regexp_extract_all(F.lower(_c(col)), F.lit(ALNUM_TOKEN_RX), F.lit(1)))
    ).cast("long")


def nonspace_char_count(col) -> F.Column:
    return F.length(F.regexp_replace(_c(col), r"\s", "")).cast("long")


def avg_word_length(col) -> F.Column:
    wc = word_count(col)
    return F.when(wc > 0, nonspace_char_count(col).cast("double") / wc).otherwise(F.lit(0.0))


def lexical_diversity(col) -> F.Column:
    wc = word_count(col)
    return F.when(wc > 0, unique_word_count(col).cast("double") / wc).otherwise(F.lit(0.0))


def token_count(col) -> F.Column:
    """BPE-ish tokenization: alpha runs, digit runs, single symbols."""
    return _count(_c(col), TOKEN_RX)


def text_features(col) -> list[F.Column]:
    """The full F15 feature block, each aliased (matches oracle SQL names)."""
    c = _c(col)
    return [
        char_count(c).alias("char_count"),
        word_count(c).alias("word_count"),
        sentence_count(c).alias("sentence_count"),
        punctuation_count(c).alias("punctuation_count"),
        digit_count(c).alias("digit_count"),
        uppercase_count(c).alias("uppercase_count"),
        unique_word_count(c).alias("unique_word_count"),
        avg_word_length(c).alias("avg_word_length"),
        lexical_diversity(c).alias("lexical_diversity"),
        token_count(c).alias("token_count"),
    ]


def lang_scores(col) -> dict[str, F.Column]:
    low = F.lower(_c(col))
    return {lang: _count(low, rx) for lang, rx in LANG_STOPWORDS.items()}


def lang_id(col) -> F.Column:
    """Heuristic language ID: argmax of stopword hit counts, 'und'
    (undetermined) when every score is 0; ties break by LANG_PRIORITY."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col) -> F.Column:
    """Deterministic document quality heuristic in [0, 1]:
    mean of (alpha ratio, en-stopword presence ratio capped at 1,
    word-length sanity, terminal punctuation presence)."""
    c = _c(col)
    chars = char_count(c)
    words = word_count(c)
    alpha = _count(c, r"([A-Za-z])")
    stop = _count(F.lower(c), LANG_STOPWORDS["en"])
    awl = avg_word_length(c)
    alpha_ratio = F.when(chars > 0, alpha.cast("double") / chars).otherwise(F.lit(0.0))
    stop_ratio = F.least(
        F.when(words > 0, stop.cast("double") * 10.0 / words).otherwise(F.lit(0.0)), F.lit(1.0)
    )
    wl_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(sentence_count(c) > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    return (alpha_ratio + stop_ratio + wl_ok + punct_ok) / F.lit(4.0)


def repetition_features(col) -> list[F.Column]:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1), the standard quality gate a large-scale corpus pipeline runs
    before dedup. All three are shuffle-free Column algebra over one token
    array; every fraction is a SINGLE bigint/bigint division so the double
    is bit-identical across engines (no order-dependent float sums):

    * ``dup_word_frac``  — 1 - distinct/total tokens,
    * ``top_word_frac``  — most frequent token's share (max run length on
      the SORTED token array == max frequency, computed with one
      ``aggregate`` pass — no explode, no per-doc shuffle),
    * ``dup_2gram_frac`` — duplicate share among word 2-grams.
    """
    toks = F.regexp_extract_all(F.lower(_c(col)), F.lit(ALNUM_TOKEN_RX), F.lit(1))
    n_words = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    # max run on the sorted array: carry (prev token, current run, best run)
    top_cnt = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    grams2 = F.when(
        n_words >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_g = F.size(grams2).cast("long")
    n_dg = F.size(F.array_distinct(grams2)).cast("long")
    frac = lambda num, den: (  # noqa: E731 — one-shot local shorthand
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    )
    return [
        n_words.alias("n_words"),
        frac(n_words - n_distinct, n_words).alias("dup_word_frac"),
        frac(top_cnt, n_words).alias("top_word_frac"),
        frac(n_g - n_dg, n_g).alias("dup_2gram_frac"),
    ]


def fingerprint(col) -> F.Column:
    """Document fingerprint: md5 of the casefolded, alnum-token-normalized
    text — equal for documents that differ only in spacing/punctuation."""
    normalized = F.array_join(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(ALNUM_TOKEN_RX), F.lit(1)), " "
    )
    return F.md5(normalized)


def md5_long(col: F.Column) -> F.Column:
    """Cross-engine 60-bit integer hash: first 15 hex chars of md5.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------- reference parity
# The engine's primary feature definitions above deliberately differ from
# the reference in two places (documented in the module docstring). The
# ``*_ref`` variants below reproduce the reference's exact semantics
# (src/OMOP_MEDS/pre_meds_utils.py:949-1051) and are pinned to its golden
# values (tests/test_nlp_feature_extraction.py:36-46) in
# tests/test_text_ref_parity.py:
#
# * sentence_count_ref — non-empty chunks after splitting on [.!?]+
#   (reference: ``len([s for s in re.split(r"[.!?]+", text) if s.strip()])``)
# * avg_word_length_ref — mean of per-word lengths with the chars ``.,!?;:``
#   stripped from both ends (the reference's ``word.strip(".,!?;:")``)
# * unique_word_count_ref / lexical_diversity_ref — distinct of
#   lowercased+stripped words (empty strings count, as in the reference)
# * punctuation_count_ref — the reference's wider class ``[.,!?;:\-()"']``
#
# Null handling: the reference coerces None/empty text to all-zero features;
# the _ref variants compute over coalesce(text, '') to match. Ratios are
# returned at full double precision — the reference's presentation-level
# round(x, 2/3) is applied by callers (Python round is half-even while SQL
# engines round half-up, so baking it in would break cross-engine parity).

STRIP_EDGE_RX = r"^[.,!?;:]+|[.,!?;:]+$"
PUNCT_REF_RX = r"""([.,!?;:\-()"'])"""


def _strip_edge(w: F.Column) -> F.Column:
    return F.regexp_replace(w, STRIP_EDGE_RX, "")


def words_array(col) -> F.Column:
    """The reference's ``text.split()`` word list (whitespace runs, no
    empties)."""
    return F.regexp_extract_all(F.coalesce(_c(col), F.lit("")), F.lit(WORD_RX), F.lit(1))


def sentence_count_ref(col) -> F.Column:
    chunks = F.split(F.coalesce(_c(col), F.lit("")), r"[.!?]+")
    return F.size(F.filter(chunks, lambda s: s.rlike(r"\S"))).cast("long")


def avg_word_length_ref(col) -> F.Column:
    words = words_array(col)
    total = F.aggregate(
        F.transform(words, lambda w: F.length(_strip_edge(w))), F.lit(0), lambda a, x: a + x
    )
    wc = F.size(words)
    return F.when(wc > 0, total.cast("double") / wc).otherwise(F.lit(0.0))


def avg_sentence_length_ref(col) -> F.Column:
    sc = sentence_count_ref(col)
    wc = F.size(words_array(col))
    return F.when(sc > 0, wc.cast("double") / sc).otherwise(F.lit(0.0))


def unique_word_count_ref(col) -> F.Column:
    words = words_array(col)
    return F.size(
        F.array_distinct(F.transform(words, lambda w: _strip_edge(F.lower(w))))
    ).cast("long")


def lexical_diversity_ref(col) -> F.Column:
    wc = F.size(words_array(col))
    return F.when(wc > 0, unique_word_count_ref(col).cast("double") / wc).otherwise(F.lit(0.0))


def punctuation_count_ref(col) -> F.Column:
    return _count(F.coalesce(_c(col), F.lit("")), PUNCT_REF_RX)


def text_features_ref(col) -> list[F.Column]:
    """The reference-semantics feature block (word/char counts are already
    reference-identical in the primary block)."""
    c = _c(col)
    return [
        F.size(words_array(c)).cast("long").alias("word_count"),
        F.length(F.coalesce(c, F.lit(""))).cast("long").alias("char_count"),
        sentence_count_ref(c).alias("sentence_count_ref"),
        avg_word_length_ref(c).alias("avg_word_length_ref"),
        avg_sentence_length_ref(c).alias("avg_sentence_length_ref"),
        unique_word_count_ref(c).alias("unique_word_count_ref"),
        lexical_diversity_ref(c).alias("lexical_diversity_ref"),
        punctuation_count_ref(c).alias("punctuation_count_ref"),
    ]
