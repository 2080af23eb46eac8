"""YAML-driven MEDS event conversion: config in, EventBlocks out.

The reference's event templates are declarative YAML consumed at runtime
(reference: src/OMOP_MEDS/configs/event_configs.yaml:1-169) — a user edits
config, not code. This module loads the same syntax and compiles it into
the engine's ``EventBlock`` projections (operators/meds.py), closing the
config-file workflow:

* top-level ``subject_id_col`` names the subject column for every table;
* each remaining top-level key is a TABLE whose value maps event names to
  field specs;
* a field value is ``$col`` (column reference), ``null`` (static event —
  no time), an ``f"...{$col}..."`` template (compiled to a JVM ``concat``
  of literal segments and string-cast columns — null component → null
  code, one codegen'd expression, no Python), or a bare literal;
* ``$table_name`` resolves to the enclosing table's name (the reference's
  injected ``table_name: $table_name``, event_configs.yaml:8);
* fields beyond the canonical MEDS five pass through as extra string
  columns (``unit`` / ``visit_occurrence_id`` / ``link_id`` / …);
* derived time columns (the reference's ``$preferred_time``) are computed
  UPSTREAM on the DataFrame before the config applies — same layering as
  the reference's pre-MEDS wrangling.

``prune_tables`` mirrors the reference's runtime table pruning: config
entries whose table was not materialized are dropped with a warning list
(reference: src/OMOP_MEDS/__main__.py:63-74).

Scale: compilation is driver-side string work producing pure Column
expressions; the resulting plan is the same shuffle-free
projection + explode as hand-written EventBlocks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.meds import EventBlock, to_meds_events

#: canonical MEDS fields a spec may set; anything else becomes an extra
CANONICAL_FIELDS = {"code", "time", "numeric_value", "text_value"}

_FSTRING = re.compile(r'^f"(.*)"$', re.DOTALL)
_PLACEHOLDER = re.compile(r"\{\$(\w+)\}")


class EventConfigError(ValueError):
    """Malformed event config (the config-contract failure mode)."""


@dataclass(frozen=True)
class EventConfig:
    subject_id_col: str
    tables: dict[str, dict[str, dict]]  # table → event name → raw field spec

    def table_names(self) -> list[str]:
        return list(self.tables)


def load_event_config(path: str | Path) -> EventConfig:
    """Parse + structurally validate an event config YAML file."""
    return load_event_config_text(Path(path).read_text(), name=str(path))


def packaged_event_config(resource: str) -> EventConfig:
    """Load a config shipped inside the package (``configs/<name>.yaml``) —
    importlib.resources, so it works identically from a source tree and
    from a ``spark-submit --py-files`` zip archive."""
    from importlib.resources import files

    text = files("omop_meds_spark").joinpath("configs", resource).read_text()
    return load_event_config_text(text, name=f"omop_meds_spark/configs/{resource}")


def load_event_config_text(text: str, name: str = "<config>") -> EventConfig:
    """Parse config YAML (the reference's event_configs.yaml syntax).

    >>> cfg = load_event_config_text('''
    ... subject_id_col: person_id
    ... visit:
    ...   start:
    ...     code: VISIT//START
    ...     time: $visit_start
    ... ''')
    >>> cfg.subject_id_col
    'person_id'
    >>> cfg.table_names()
    ['visit']
    >>> cfg.tables["visit"]["start"]["code"]
    'VISIT//START'
    >>> load_event_config_text("subject_id_col: s\\nvisit: {bad: {code: X}}")
    Traceback (most recent call last):
        ...
    omop_meds_spark.event_config.EventConfigError: <config>: event \
visit.bad lacks required 'time' (use null for static)
    """
    import yaml

    raw = yaml.safe_load(text)
    path = name
    if not isinstance(raw, dict):
        raise EventConfigError(f"{path}: top level must be a mapping")
    subject = raw.get("subject_id_col")
    if not isinstance(subject, str) or not subject:
        raise EventConfigError(f"{path}: missing/invalid subject_id_col")
    tables: dict[str, dict[str, dict]] = {}
    for table, events in raw.items():
        if table == "subject_id_col":
            continue
        if not isinstance(events, dict) or not events:
            raise EventConfigError(f"{path}: table {table!r} must map event names to specs")
        for name, spec in events.items():
            if not isinstance(spec, dict):
                raise EventConfigError(f"{path}: event {table}.{name} must be a mapping")
            if "code" not in spec:
                raise EventConfigError(f"{path}: event {table}.{name} lacks required 'code'")
            if "time" not in spec:
                raise EventConfigError(
                    f"{path}: event {table}.{name} lacks required 'time' (use null for static)"
                )
        tables[table] = {n: dict(s) for n, s in events.items()}
    return EventConfig(subject_id_col=subject, tables=tables)


def prune_tables(cfg: EventConfig, available: set[str] | list[str]) -> tuple[EventConfig, list[str]]:
    """Drop config tables that were not materialized; returns (pruned
    config, removed table names) — reference __main__.py:63-74.

    >>> cfg = EventConfig("s", {"a": {"e": {"code": "C", "time": None}},
    ...                         "b": {"e": {"code": "C", "time": None}}})
    >>> pruned, removed = prune_tables(cfg, {"a"})
    >>> pruned.table_names(), removed
    (['a'], ['b'])
    """
    avail = set(available)
    removed = [t for t in cfg.tables if t not in avail]
    kept = {t: v for t, v in cfg.tables.items() if t in avail}
    return EventConfig(cfg.subject_id_col, kept), removed


def compile_value(value, columns: set[str], synthetic: dict[str, F.Column]) -> F.Column:
    """One YAML field value → one Column expression (see module doc)."""
    if value is None:
        return F.lit(None)
    if not isinstance(value, str):
        return F.lit(value)  # numeric/bool literal
    m = _FSTRING.match(value)
    if m:
        template = m.group(1)
        # fail fast on malformed placeholders: any brace left outside a
        # matched {$word} would otherwise pass through as literal text and
        # silently corrupt every emitted code (bare $col refs already fail
        # fast on typos — the f-string syntax must too)
        leftover = _PLACEHOLDER.sub("", template)
        if "{" in leftover or "}" in leftover:
            raise EventConfigError(
                f"malformed placeholder in f-string template {value!r} — "
                f"only {{$column_name}} is allowed")
        parts: list[F.Column] = []
        pos = 0
        for ph in _PLACEHOLDER.finditer(template):
            if ph.start() > pos:
                parts.append(F.lit(template[pos:ph.start()]))
            parts.append(_colref(ph.group(1), columns, synthetic).cast("string"))
            pos = ph.end()
        if pos < len(template):
            parts.append(F.lit(template[pos:]))
        return F.concat(*parts) if parts else F.lit("")
    if value.startswith("$"):
        return _colref(value[1:], columns, synthetic)
    return F.lit(value)  # bare code literal, e.g. MEDS_DEATH


def _colref(name: str, columns: set[str], synthetic: dict[str, F.Column]) -> F.Column:
    if name in synthetic:
        return synthetic[name]
    if name not in columns:
        raise EventConfigError(f"config references unknown column ${name}")
    return F.col(name)


def compile_blocks(cfg: EventConfig, table: str, df: DataFrame) -> list[EventBlock]:
    """Compile one table's event specs against a DataFrame's actual schema
    (unknown ``$col`` references fail fast, driver-side)."""
    if table not in cfg.tables:
        raise EventConfigError(f"table {table!r} not in event config")
    columns = set(df.columns)
    if cfg.subject_id_col not in columns:
        raise EventConfigError(
            f"subject_id_col {cfg.subject_id_col!r} missing from table {table!r}"
        )
    synthetic = {"table_name": F.lit(table)}
    blocks: list[EventBlock] = []
    for _name, spec in cfg.tables[table].items():
        c = lambda v: compile_value(v, columns, synthetic)  # noqa: E731
        extras = {k: c(v) for k, v in spec.items() if k not in CANONICAL_FIELDS}
        blocks.append(
            EventBlock(
                code=c(spec["code"]),
                time=c(spec["time"]),
                subject_id=F.col(cfg.subject_id_col),
                numeric_value=c(spec["numeric_value"]) if "numeric_value" in spec else None,
                text_value=c(spec["text_value"]) if "text_value" in spec else None,
                extras=extras,
            )
        )
    return blocks


def events_from_config(df: DataFrame, cfg: EventConfig, table: str) -> DataFrame:
    """Apply one table's config: wide rows → MEDS event stream."""
    return to_meds_events(df, compile_blocks(cfg, table, df))
