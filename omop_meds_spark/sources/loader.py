"""Multi-format table loader with declared schemas (reference S1-S8).

The reference loads each OMOP table from a single file or a directory of
shards in csv / csv.gz / parquet, always with a *declared* schema —
inference is explicitly disabled (reference:
src/OMOP_MEDS/pre_meds_data_loader.py:40-126, ``infer_schema=False`` +
``schema_overrides``; path resolution ``get_table_path``
pre_meds_utils.py:24-31). Spark-first recast:

* one ``spark.read.schema(declared)`` per table — Spark handles shard
  directories and ``.csv.gz`` decompression natively, so the reference's
  bounded-concat workaround (pre_meds_data_loader.py:86-115) disappears;
* column-name lowercasing post-scan (reference :129, :338);
* name/regex column selection (reference ``col_selector``
  pre_meds_utils.py:466-488) applied as an early ``select`` so Catalyst
  prunes the scan (ReadSchema shrinks to the selection);
* footer-only row estimation for batch planning (reference
  ``estimate_rows`` pre_meds_data_loader.py:213-225) — metadata only,
  zero data read, driver-side.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def resolve_table_path(input_dir: str | Path, name: str) -> Path | None:
    """S6: find ``{name}`` as a file (any supported extension) or shard
    directory under ``input_dir`` (reference get_table_path)."""
    d = Path(input_dir)
    direct = d / name
    if direct.is_dir():
        return direct
    for ext in (".parquet", ".csv", ".csv.gz"):
        p = d / f"{name}{ext}"
        if p.exists():
            return p
    return None


def col_selector(
    columns: list[str],
    names: list[str] | None = None,
    patterns: list[str] | None = None,
    invert: bool = False,
) -> list[str]:
    """P2/P3: union of by-name + regex column selection; ``invert`` drops
    the selection instead (metadata-column suppression). Raises if the
    selection is empty and not inverted (reference raises likewise)."""
    names = names or []
    patterns = patterns or []
    picked = [
        c
        for c in columns
        if c in names or any(re.search(p, c) for p in patterns)
    ]
    if invert:
        return [c for c in columns if c not in picked]
    if not picked:
        raise ValueError("column selector matched nothing")
    return picked


def load_table(
    spark: SparkSession,
    path: str | Path,
    schema: T.StructType,
    select_names: list[str] | None = None,
    select_patterns: list[str] | None = None,
    drop_patterns: list[str] | None = None,
) -> DataFrame:
    """S1-S5: read a table (file or shard dir, csv/csv.gz/parquet) with the
    declared schema — never inferred — then lowercase names and apply the
    selectors. The format is dispatched from the path; a shard directory is
    probed by its first file."""
    p = Path(path)
    probe = p
    if p.is_dir():
        files = sorted(x for x in p.iterdir() if x.is_file() and not x.name.startswith("_"))
        if not files:
            raise FileNotFoundError(f"empty shard directory {p}")
        probe = files[0]

    if probe.name.endswith((".csv", ".csv.gz")):
        df = _load_csv_by_name(spark, p, schema)
        return _apply_selectors(df, select_names, select_patterns, drop_patterns)
    elif probe.name.endswith(".parquet"):
        # read with the file's own footer schema, then try_cast-project to
        # the declared one (permissive, like convert_to_schema_polars with
        # allow_extra_columns=True)
        df = spark.read.parquet(str(p))
        lowered = df.toDF(*[c.lower() for c in df.columns])
        from ..plans.align import SchemaRegistry

        reg = SchemaRegistry(target=schema)
        out = reg.align(lowered)
        return _apply_selectors(out, select_names, select_patterns, drop_patterns)
    else:
        raise ValueError(f"unsupported table format: {probe}")

    df = df.toDF(*[c.lower() for c in df.columns])
    return _apply_selectors(df, select_names, select_patterns, drop_patterns)


def _csv_header(path: Path) -> list[str]:
    """Driver-side read of a CSV file's header row (handles .gz)."""
    import csv
    import gzip

    opener = gzip.open if path.name.endswith(".gz") else open
    with opener(path, "rt", newline="") as f:
        return [c.strip().lower() for c in next(csv.reader(f))]


def _load_csv_by_name(spark: SparkSession, p: Path, schema: T.StructType) -> DataFrame:
    """CSV load that binds the declared schema BY NAME, not by position.

    Spark's ``schema + header=True + enforceSchema=True`` binds positionally
    and ignores header names — a shard whose column order differs from the
    declared StructType would be silently misread. Like the reference
    (``schema_overrides`` binds by name, pre_meds_data_loader.py:46-67),
    each distinct header layout gets its own positional read schema built
    FROM its header (declared type where the name is known, string
    otherwise), then aligns to the declared schema (reorder + try_cast +
    missing→null) and unions. Header reads are driver-side footer-style
    peeks (one line per file); the data scan stays distributed."""
    from functools import reduce

    from ..plans.align import SchemaRegistry

    files = (
        sorted(x for x in p.iterdir() if x.is_file() and not x.name.startswith("_"))
        if p.is_dir()
        else [p]
    )
    declared = {f.name.lower(): f.dataType for f in schema.fields}
    groups: dict[tuple[str, ...], list[str]] = {}
    for f in files:
        groups.setdefault(tuple(_csv_header(f)), []).append(str(f))

    reg = SchemaRegistry(target=schema)
    parts = []
    for header, paths in groups.items():
        read_schema = T.StructType(
            [T.StructField(h, declared.get(h, T.StringType()), True) for h in header]
        )
        part = (
            spark.read.schema(read_schema)
            .option("header", True)
            .option("enforceSchema", True)
            .csv(paths)
        )
        parts.append(reg.align(part))
    return reduce(lambda a, b: a.unionByName(b), parts)


def _apply_selectors(df, select_names, select_patterns, drop_patterns):
    if drop_patterns:
        keep = col_selector(df.columns, patterns=drop_patterns, invert=True)
        df = df.select(*keep)
    if select_names or select_patterns:
        df = df.select(*col_selector(df.columns, select_names, select_patterns))
    return df


def estimate_rows(path: str | Path) -> int:
    """S7: parquet-footer row count — metadata only (driver-side)."""
    import pyarrow.parquet as pq

    p = Path(path)
    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
