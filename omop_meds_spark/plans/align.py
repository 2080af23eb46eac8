"""Schema registry + permissive alignment (schema evolution).

Re-expresses the reference's most load-bearing machinery — union-of-columns
target schema with per-column conflict widening and shard alignment
(reference: src/OMOP_MEDS/pre_meds_data_loader.py:341-507:
``resolve_target_schema`` / ``_resolve_conflict`` / ``_align_shard_to_schema``
/ ``harmonize_shard`` / ``project_to_target_schema``) — as the CDC engine's
schema-evolution layer:

* names are lowercased (reference :129, :338) and mapped through a rename
  table (the "renamed OMOP column" case),
* a new incoming column **widens the registry** (adopted, transactional:
  the new target schema is recorded in the snapshot manifest at commit),
* a type conflict resolves by the widening ladder: equal → keep; both
  integral → widest; any fractional/decimal mix → double; date vs
  timestamp → timestamp; otherwise → string (reference
  pre_meds_data_loader.py:341-372),
* every batch (and every old snapshot on read) is **aligned** to the
  current target: missing column → typed null literal, type mismatch →
  permissive ``try_cast`` (null on failure, the analogue of polars
  ``cast(strict=False)``), extra registry columns keep their slot.

All of this is pure Column algebra — a ``select`` list — so Catalyst still
sees a straight-line projection and pushes scans/prunes through it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_WIDTH = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4}


def widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Resolve a type conflict by widening (never narrowing)."""
    if a == b:
        return a
    ia, ib = _INT_WIDTH.get(type(a)), _INT_WIDTH.get(type(b))
    if ia and ib:
        return a if ia >= ib else b
    numericish = (T.FloatType, T.DoubleType, T.DecimalType)
    if (ia or isinstance(a, numericish)) and (ib or isinstance(b, numericish)):
        return T.DoubleType()
    dateish = (T.DateType, T.TimestampType)
    if isinstance(a, dateish) and isinstance(b, dateish):
        return T.TimestampType()
    return T.StringType()


@dataclass
class SchemaRegistry:
    """Versioned target schema for one table, with a rename map."""

    target: T.StructType
    renames: dict[str, str] = field(default_factory=dict)  # incoming -> canonical
    version: int = 0

    def canonical_name(self, name: str) -> str:
        n = name.lower()
        return self.renames.get(n, n)

    def evolve(self, incoming: T.StructType) -> bool:
        """Adopt new columns / widen conflicts from an incoming schema.
        Returns True if the target schema changed (version bump)."""
        current = {f.name: f.dataType for f in self.target.fields}
        changed = False
        order = [f.name for f in self.target.fields]
        for f in incoming.fields:
            name = self.canonical_name(f.name)
            if name in current:
                w = widen(current[name], f.dataType)
                if w != current[name]:
                    current[name] = w
                    changed = True
            else:
                current[name] = f.dataType
                order.append(name)
                changed = True
        if changed:
            self.target = T.StructType(
                [T.StructField(n, current[n], True) for n in order]
            )
            self.version += 1
        return changed

    def align(self, df: DataFrame) -> DataFrame:
        """Project ``df`` to exactly the target schema (missing → typed null,
        mismatch → try_cast, renames applied). One select; no shuffle."""
        # lowercase + rename first (reference lowercases all names post-scan)
        by_canonical = {}
        for c in df.columns:
            by_canonical[self.canonical_name(c)] = c
        cols = []
        incoming_types = {self.canonical_name(f.name): f.dataType for f in df.schema.fields}
        for f in self.target.fields:
            src = by_canonical.get(f.name)
            if src is None:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif incoming_types[f.name] == f.dataType:
                cols.append(F.col(src).alias(f.name))
            else:
                cols.append(F.col(src).try_cast(f.dataType).alias(f.name))
        return df.select(*cols)

    def schema_json(self) -> str:
        return self.target.json()
