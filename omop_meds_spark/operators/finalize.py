"""Pipeline finalization: subject splits + MEDS metadata artifacts.

The reference's ETL ends with ``split_and_shard_subjects`` …
``finalize_MEDS_metadata`` (reference: configs/ETL.yaml:25-33), and its e2e
test asserts the metadata directory contents
``metadata/{dataset.json, codes.parquet, subject_splits.parquet}``
(reference: tests/e2e_demo_test.py:61-87). Spark recast:

* **split assignment** is a pure hash function of the subject id — the
  cross-engine ``md5_long`` bucketed into per-mille thresholds — so it is
  deterministic, partition-layout-invariant, reproducible in SQL, and needs
  no driver-side state (the reference shuffles subject lists driver-side;
  at 10^9 subjects a hash split is the only shape that scales).
* **finalize_metadata** writes the three artifacts with an atomic
  tmp→rename publish per file (same protocol as the snapshot log).

MEDS split-name convention (train/tuning/held_out) follows the MEDS v0.4
schema the reference targets (pyproject.toml:21).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long

SPLIT_NAMES = ("train", "tuning", "held_out")


def split_col(subject_col: str = "subject_id", fracs: tuple[float, float, float] = (0.8, 0.1, 0.1)) -> F.Column:
    """Deterministic split assignment: md5_long(subject_id) per-mille
    bucket against cumulative thresholds. Exact DuckDB twin in
    oracles.py (``subject_splits``)."""
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {fracs}")
    h = F.pmod(md5_long(F.col(subject_col).cast("string")), F.lit(1000))
    t1 = int(round(fracs[0] * 1000))
    t2 = t1 + int(round(fracs[1] * 1000))
    return (
        F.when(h < t1, F.lit(SPLIT_NAMES[0]))
        .when(h < t2, F.lit(SPLIT_NAMES[1]))
        .otherwise(F.lit(SPLIT_NAMES[2]))
    )


def assign_splits(
    subjects: DataFrame,
    subject_col: str = "subject_id",
    fracs: tuple[float, float, float] = (0.8, 0.1, 0.1),
) -> DataFrame:
    """(subject_id, split) — one row per distinct subject. One shuffle
    (the distinct); the split itself is a narrow map."""
    return subjects.select(F.col(subject_col)).distinct().select(
        F.col(subject_col), split_col(subject_col, fracs).alias("split")
    )


def _atomic_write_text(path: Path, text: str) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=".tmp.", dir=path.parent)
    with os.fdopen(fd, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def finalize_metadata(
    events: DataFrame,
    out_dir: str | Path,
    dataset_name: str,
    dataset_version: str,
    codes: DataFrame | None = None,
    subject_col: str = "subject_id",
    fracs: tuple[float, float, float] = (0.8, 0.1, 0.1),
) -> dict:
    """finalize_MEDS_metadata analogue: write
    ``{out_dir}/metadata/{dataset.json, codes.parquet,
    subject_splits.parquet}`` (reference e2e contract,
    tests/e2e_demo_test.py:61-87).

    ``codes`` defaults to the per-code occurrence counts over ``events``
    (extract_code_metadata analogue); pass ``extract_codes_metadata``
    output for the full concept-derived dictionary. Returns the dataset
    metadata dict. Parquet writes go through Spark (distributed); only the
    tiny dataset.json is written driver-side."""
    from .meds import code_occurrence_counts

    meta_dir = Path(out_dir) / "metadata"
    meta_dir.mkdir(parents=True, exist_ok=True)

    if codes is None:
        codes = code_occurrence_counts(events)
    codes.write.mode("overwrite").parquet(str(meta_dir / "codes.parquet"))

    splits = assign_splits(events, subject_col, fracs)
    splits.write.mode("overwrite").parquet(str(meta_dir / "subject_splits.parquet"))

    meta = {
        "dataset_name": dataset_name,
        "dataset_version": dataset_version,
        "etl_name": "omop_meds_spark",
        "meds_version": "0.4",
        "split_fractions": dict(zip(SPLIT_NAMES, fracs)),
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    _atomic_write_text(meta_dir / "dataset.json", json.dumps(meta, indent=2))
    return meta
