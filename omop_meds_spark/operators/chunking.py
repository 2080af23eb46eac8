"""Context-window document chunking: split long texts into fixed-size
character windows with overlap — the tokenizer-feed grain of an LLM
training pipeline (each chunk becomes one training sequence; the stride
overlap preserves cross-boundary context).

Spark-first shape: chunk starts are a ``sequence()`` literal-step array,
``posexplode`` fans the document into (chunk_idx, start) rows, and
``substring`` slices — all whole-stage-codegen Column algebra, ZERO
Python, ZERO shuffles (a pure projection; the explode multiplies rows
inside the scan stage). At 100 TB the operator is embarrassingly
parallel: no key, no exchange, output partitioning inherits the scan.

Related reference shape: the reference batches long tables into
row-windows for memory control (src/OMOP_MEDS/pre_meds.py:326-416); this
is the same windowing idea applied INSIDE a value column, which a
training-data pipeline needs and a per-table ETL does not.

Cross-engine determinism: chunk starts are ``range(0, max(len,1),
stride)`` in both engines (Spark's end-inclusive ``sequence(0, len-1)``
equals DuckDB's end-exclusive ``range(0, len)`` over integers); substring
is 1-based in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    stride: int = 150,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (document, chunk window).

    Columns: ``id_col``, any ``keep_cols``, ``chunk_idx`` (0-based),
    ``chunk_start`` (0-based char offset), ``chunk_text`` (length <=
    ``chunk_chars``; the final chunk is the tail remainder). An empty
    text still yields one empty chunk (chunk_idx 0) so no document is
    silently dropped.

    ``stride < chunk_chars`` gives overlapping windows (the LLM-context
    default); ``stride == chunk_chars`` gives a disjoint partition of the
    text.
    """
    if stride <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride must be positive")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - 1, F.lit(0)),
        F.lit(stride),
    )
    pos = F.posexplode(starts)
    out = df.select(
        id_col,
        *(keep_cols or []),
        pos.alias("chunk_idx", "chunk_start"),
        F.col(text_col).alias("__t"),
    )
    return out.select(
        id_col,
        *(keep_cols or []),
        "chunk_idx",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.substring(F.col("__t"), F.col("chunk_start") + 1, F.lit(chunk_chars)).alias("chunk_text"),
    )
