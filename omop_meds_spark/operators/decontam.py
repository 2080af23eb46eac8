"""Benchmark decontamination: n-gram overlap against a held-out eval set.

The GPT-3/PaLM-style training-data hygiene step: any training document
sharing at least one word n-gram with an evaluation document is flagged
(and usually dropped) so benchmark answers cannot leak into the corpus.

Spark-first shape (scales to 100 TB):

* Both sides tokenize with the shared ``tokens_col`` regex and expand to
  DISTINCT n-grams via a zero-UDF ``transform(sequence(...), slice)``
  projection — no Python, no shuffle to build grams.
* Eval grams are DISTINCT-ed and **broadcast** (an eval suite is MBs even
  when the corpus is 100 TB), so contamination detection is a map-side
  broadcast semi/inner join on the 60-bit cross-engine ``md5_long`` of the
  gram — the corpus is never shuffled.
* The per-doc hit count aggregates on ``doc_id`` — one exchange over the
  (tiny) contaminated subset only, because the broadcast join filters
  first.

Unlike ``dedup.shingles_col`` (which backfills short docs with one whole-doc
shingle so MinHash never sees an empty set), decontamination uses STRICT
n-grams: a document shorter than n words contributes nothing — mirroring
the ``generate_series(1, len-n+1)`` window semantics of the SQL oracle.

Reference scope note: the reference ETL (rvandewater/OMOP_MEDS) has no
decontamination stage; this operator belongs to the engine's
training-data-pipeline axis (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long
from .dedup import tokens_col

DEFAULT_N = 5


def ngrams_strict_col(col, n: int = DEFAULT_N) -> F.Column:
    """DISTINCT word n-grams; empty array when the doc has < n tokens."""
    toks = tokens_col(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(ngrams_strict_col(text_col, n)).alias("_gram"),
    ).select(id_col, md5_long(F.col("_gram")).alias("_gh"))


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Per contaminated training doc: how many DISTINCT eval n-grams it
    contains. Docs with zero hits are absent (drop-list semantics).

    Returns (id_col, n_hits). The eval gram set is broadcast; the train
    side streams map-side through the join and only matching rows reach
    the one groupBy exchange.
    """
    eval_grams = F.broadcast(
        _gram_hashes(eval_df, id_col, text_col, n).select("_gh").distinct()
    )
    hits = _gram_hashes(train, id_col, text_col, n).join(eval_grams, "_gh")
    return hits.groupBy(id_col).agg(
        F.count_distinct("_gh").alias("n_hits")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Training rows that share NO n-gram with the eval set (the kept
    corpus). Broadcast anti-join — zero shuffle of the corpus."""
    eval_grams = F.broadcast(
        _gram_hashes(eval_df, id_col, text_col, n).select("_gh").distinct()
    )
    contaminated = (
        _gram_hashes(train, id_col, text_col, n)
        .join(eval_grams, "_gh")
        .select(id_col)
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")
