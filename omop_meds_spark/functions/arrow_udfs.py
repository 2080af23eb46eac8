"""Vectorized pandas/Arrow UDFs (the sanctioned Python escape hatch).

The north rule allows exactly two expression surfaces: built-in DataFrame
ops (JVM, whole-stage codegen) and *vectorized* pandas/Arrow UDFs — never
per-row Python. The reference's two ``map_elements`` row UDFs
(src/OMOP_MEDS/pre_meds_utils.py:238-241, 1143-1161) are re-expressed
elsewhere as Column algebra; this module holds the cases where a pandas UDF
is genuinely the right tool:

* regex-heavy normalization where one Arrow batch transfer beats a stack of
  JVM regex passes (``content_metrics``),
* code-mapping normalization with Python-side lookup semantics
  (``normalize_code_batch``),
* and it doubles as the proof-of-parity harness: each UDF has a Column-
  algebra twin and tests assert they agree bit-for-bit, so either engine
  path can serve any query.

All UDFs here receive/return ``pandas.Series`` and are Arrow-batched —
one Python invocation per ~10k-row batch, never per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType, StructField, StructType

CONTENT_METRICS_SCHEMA = StructType(
    [
        StructField("n_lines", LongType()),
        StructField("n_bytes", LongType()),
        StructField("max_line_len", LongType()),
    ]
)


@pandas_udf(CONTENT_METRICS_SCHEMA)
def content_metrics(content: pd.Series) -> pd.DataFrame:
    """Per-document source metrics, vectorized over an Arrow batch.

    Column-algebra twin (tested equal): n_lines = count of '\\n' runs + 1
    on non-empty, n_bytes = octet_length, max_line_len = array_max over
    split lines.
    """
    s = content.fillna("")
    lines = s.str.split("\n")
    return pd.DataFrame(
        {
            "n_lines": lines.str.len().astype("int64"),
            "n_bytes": s.str.encode("utf-8").str.len().astype("int64"),
            "max_line_len": lines.map(lambda ls: max((len(x) for x in ls), default=0)).astype(
                "int64"
            ),
        }
    )


def content_metrics_builtin(col) -> list[F.Column]:
    """JVM twin of ``content_metrics`` (split + size + array_max)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    lines = F.split(c, "\n", -1)
    return [
        F.size(lines).cast("long").alias("n_lines"),
        F.octet_length(c).cast("long").alias("n_bytes"),
        F.coalesce(F.array_max(F.transform(lines, lambda x: F.length(x))), F.lit(0))
        .cast("long")
        .alias("max_line_len"),
    ]


def make_code_mapper(mapping: dict[str, str], default_prefix: str = "LANG//"):
    """Code-mapping normalization as a closed-over pandas UDF — the CDC
    analogue of the reference's concept-dictionary joins
    (src/OMOP_MEDS/pre_meds_utils.py:403-441) for maps small enough to ship
    in the task closure. Unmapped values fall back to the reference's
    composed-code pattern ``{prefix}{raw}`` (pre_meds_utils.py:679-811).

    For large mappings use a broadcast join instead (operators/joins.py);
    this exists for the in-closure regime and as the pandas-UDF showcase.
    """

    @pandas_udf(StringType())
    def map_code(raw: pd.Series) -> pd.Series:
        mapped = raw.map(mapping)
        fallback = default_prefix + raw.fillna("unknown")
        return mapped.fillna(fallback)

    return map_code


def code_map_builtin(mapping: dict[str, str], col: F.Column | str,
                     default_prefix: str = "LANG//") -> F.Column:
    """JVM twin of ``make_code_mapper`` for the hot path: the mapping ships
    as a map literal and the lookup stays inside whole-stage codegen — no
    Arrow round-trip, no Python worker on the batch critical path (the
    per-batch Python-worker spin-up is pure serial cost that the N→4N
    scaling pays twice). Bit-equal to the pandas UDF (pinned in
    tests/test_multimodal_udfs.py); the UDF remains the showcase for
    mappings that genuinely need Python."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.create_map(*[F.lit(x) for kv in sorted(mapping.items()) for x in kv])
    return F.coalesce(
        F.element_at(m, c),
        F.concat(F.lit(default_prefix), F.coalesce(c, F.lit("unknown"))),
    )
