"""Code / concept scalar functions (reference F8-F13, P5).

All pure Column algebra. The reference's two row-UDF sites are de-UDF'd per
the north rule:

* gender decode ``map_elements`` (pre_meds_utils.py:238-241) → when/otherwise,
* everything else was already expression-level in the reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def zero_scrub(col: F.Column | str) -> F.Column:
    """P5: OMOP uses concept_id 0 for "no concept" — scrub to null
    (reference: pre_meds_utils.py:404)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c.cast("long"), F.lit(0))


def gender_decode(col: F.Column | str) -> F.Column:
    """F8: 8507→Male, 8532→Female, else stringified id — vectorized
    replacement for the reference's per-row lambda (pre_meds_utils.py:238-241)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == 8507, F.lit("Male"))
        .when(c == 8532, F.lit("Female"))
        .otherwise(c.cast("string"))
    )


def code_template(*parts: F.Column | str) -> F.Column:
    """F11: ``vocabulary//concept`` style code strings
    (reference: pre_meds_utils.py:608-622; configs/event_configs.yaml:13,29)."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("//", *cols)


def strip_code_suffix(col: F.Column | str) -> F.Column:
    """F13: strip ``//start`` / ``//end`` for metadata joins
    (reference: utils.py:26-28)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(//start|//end)$", "")


def vocab_default_fill(col: F.Column | str, table_name: str) -> F.Column:
    """F10: null vocabulary → ``OMOP_{table}`` (reference: pre_meds_utils.py:457-460)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(f"OMOP_{table_name}"))


def determine_concept_id(
    mapped_vocab: F.Column,
    mapped_code: F.Column,
    source_vocab: F.Column,
    source_code: F.Column,
    fallback: F.Column,
    prefer_source: bool = False,
) -> tuple[F.Column, F.Column]:
    """F9: choose (vocabulary, code) between the mapped and source concept
    pair by preference, falling back to a composed literal when neither
    resolves (reference: pre_meds_utils.py:679-811).

    Returns (preferred_vocabulary, preferred_code) columns, un-aliased.
    """
    first_v, first_c = (source_vocab, source_code) if prefer_source else (mapped_vocab, mapped_code)
    second_v, second_c = (mapped_vocab, mapped_code) if prefer_source else (source_vocab, source_code)
    vocab = (
        F.when(first_c.isNotNull(), first_v)
        .when(second_c.isNotNull(), second_v)
        .otherwise(F.lit(None).cast("string"))
    )
    code = F.coalesce(first_c, second_c, fallback)
    return vocab, code


# P6: custom concepts sit above a fixed id threshold (reference:
# pre_meds_utils.py "Assuming custom concepts have concept_id >
# 2000000000", pre_meds_utils.py:640-646)
CUSTOM_CONCEPT_ID_START = 2_000_000_000


def is_custom_concept(concept_id_col) -> "F.Column":
    from pyspark.sql import functions as F

    c = F.col(concept_id_col) if isinstance(concept_id_col, str) else concept_id_col
    return c > F.lit(CUSTOM_CONCEPT_ID_START)
