"""Incrementally-maintained materialized aggregate view over a CDC table.

The lakehouse pattern this implements: a ``SnapshotTable`` is the CDC
target (LWW upserts + delete tombstones); a downstream consumer wants
``SELECT dims, COUNT(*), SUM(m) ... GROUP BY dims`` over the LIVE state,
kept fresh without ever rescanning the table. ``IncrementalAggView``
folds the table's change feed into a second SnapshotTable keyed by the
group dimensions — Flink/Materialize-style incremental view maintenance,
expressed as plain DataFrame algebra over the engine's own primitives.

Per refresh of source range ``(v0, v1]`` the cost is O(changed data):

* ``read_changes(v0, v1)`` — manifest-driven, the range's delta files
  only — yields the CHANGED KEYS;
* the keys' buckets are re-read at both versions (manifest-pruned
  ``read_live``, restricted to the touched buckets and semi-joined to the
  keys) — old state decrements, new state increments. Diffing full
  before/after states (not the range's winner rows) is what makes the
  fold correct under ANY sequencing: a changed key's final value is the
  LWW across all generations, which the range's own winners need not be;
* the signed contributions aggregate to one tiny delta frame, which
  merges (full outer, null-safe on dims) into the view's current rows for
  the affected dim groups only — groups whose count reaches zero become
  delete tombstones.

The view commit is transactional and EXACTLY-ONCE: each fold commits with
``lineage={"source_version": v1}`` and the cursor is recovered from the
retained lineage, so a crashed/replayed refresh is a no-op. Vacuuming the
SOURCE past an unfolded version breaks incrementality (``read_changes``
raises); refresh before vacuum, exactly like any CDF consumer.

Measure semantics: ``n_rows`` is COUNT(*); each ``sum_cols`` entry ``c``
maintains ``sum_{c}`` in DECIMAL(28,4) (exact, order-free — incremental
folding must not depend on float addition order) plus ``cnt_{c}``
(non-null count) so ``read()`` can return SQL-exact NULL for all-null
groups.
"""

from __future__ import annotations

import functools
import operator
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table import SnapshotTable, bucket_expr

_DEC = "decimal(28,4)"


class IncrementalAggView:
    def __init__(self, root: str | Path, source: SnapshotTable,
                 dims: list[str], sum_cols: list[str] | None = None,
                 n_buckets: int | None = None):
        # n_buckets=None adopts an existing view table's stored bucket
        # layout (fresh views default to the SnapshotTable default) — a
        # re-opened view must never re-stamp the layout
        self.source = source
        self.dims = list(dims)
        self.sum_cols = list(sum_cols or [])
        self.table = SnapshotTable(root, key_cols=self.dims,
                                   n_buckets=n_buckets)

    # ------------------------------------------------------------- cursor
    @property
    def cursor(self) -> int:
        """Highest source version folded in (-1 = nothing yet), recovered
        from commit lineage — the latest fold's manifest always survives
        retention, so the cursor does."""
        lin = self.table.lineage_log()
        return max((int(d["source_version"]) for d in lin.values()
                    if isinstance(d, dict) and "source_version" in d),
                   default=-1)

    # ------------------------------------------------------------ refresh
    def _signed(self, df: DataFrame, sign: int) -> DataFrame:
        cols = [F.col(d) for d in self.dims] + [F.lit(sign).alias("_w")]
        for c in self.sum_cols:
            cols.append(F.col(c).cast("decimal(18,4)").alias(c))
        return df.select(*cols)

    def _agg(self, signed: DataFrame) -> DataFrame:
        aggs = [F.sum("_w").cast("long").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(F.sum(F.col(c) * F.col("_w")).cast(_DEC)
                        .alias(f"sum_{c}"))
            aggs.append(F.sum(F.when(F.col(c).isNotNull(), F.col("_w"))
                              .otherwise(F.lit(0))).cast("long")
                        .alias(f"cnt_{c}"))
        return signed.groupBy(*self.dims).agg(*aggs)

    def _changed_key_state(self, spark: SparkSession, version: int,
                           buckets: list[int], keys: DataFrame) -> DataFrame | None:
        if version < 0:
            return None
        st = self.source.read_live(spark, buckets=buckets, version=version)
        if st is None:
            return None
        return st.join(keys, on=self.source.key_cols, how="left_semi")

    def refresh(self, spark: SparkSession, to_version: int | None = None) -> bool:
        """Fold source versions ``(cursor, to_version]`` into the view.
        Returns False when there is nothing new. Idempotent: re-running
        with the same range is a no-op (cursor check + transactional
        commit).

        Initial materialization over a table whose early history was
        vacuumed BOOTSTRAPS from the live state instead of the change feed
        (an initial load needs no history). A vacuumed hole PAST the
        cursor, however, is unrecoverable incrementally and raises —
        refresh before vacuuming the source beyond the cursor, exactly
        like any change-feed consumer."""
        src = self.source
        head = src.version
        v1 = head if to_version is None else to_version
        if v1 > head:
            raise ValueError(f"refresh: to_version {v1} is beyond source head {head}")
        v0 = self.cursor
        if v1 <= v0:
            return False
        batch_id = max(self.table.committed_batches(), default=-1) + 1
        lineage = {"source_version": v1, "since_version": v0}

        try:
            ch = src.read_changes(spark, since_version=v0, to_version=v1)
            bootstrap = False
        except ValueError:
            if v0 >= 0:
                raise  # incremental hole: the feed between folds was vacuumed
            ch, bootstrap = None, True
        keys = None
        if bootstrap:
            new = src.read_live(spark, version=v1)
            parts = [] if new is None else [self._signed(new, 1)]
        elif ch is None:
            parts = []  # compaction-only range: just advance the cursor
        else:
            # keys feed both state reads; persist so the feed scans once
            keys = ch.select(*src.key_cols).distinct().persist()
            src_buckets = sorted(
                r["b"] for r in keys.select(
                    bucket_expr(src.key_cols, src.n_buckets).alias("b"))
                .distinct().collect())
            new = self._changed_key_state(spark, v1, src_buckets, keys)
            old = self._changed_key_state(spark, v0, src_buckets, keys)
            parts = [self._signed(d, s) for d, s in ((new, 1), (old, -1))
                     if d is not None]
        if not parts:
            # carry the recorded schema forward: an empty fold must not
            # re-stamp the view's key column types (point lookups hash by
            # the stored schema — see table.key_bucket)
            self.table.commit_delta_auto(
                self._empty_commit_frame(spark), batch_id, lineage=lineage,
                schema_json=(self.table.latest() or {}).get("schema"))
            return True
        signed = functools.reduce(lambda a, b: a.unionByName(b), parts)
        # delta drives the bucket-id collect AND the merge write — persist
        # so its O(changed-bucket state) upstream computes once
        delta = self._agg(signed).persist()
        try:
            # merge into the view's current rows for the affected dims only:
            # manifest-pruned read of the delta's buckets, null-safe semi
            # join down to the changed dim groups, then a full outer with
            # the delta (renamed columns — no alias ambiguity, nulls are
            # real groups)
            vbs = sorted(
                r["b"] for r in delta.select(
                    bucket_expr(self.dims, self.table.n_buckets).alias("b"))
                .distinct().collect())
            cur = self.table.read_live(spark, buckets=vbs)
            mtypes = self._measure_types()
            if cur is not None:
                cur_r = cur.select(
                    *[F.col(k).alias(f"_c_{k}") for k in self.dims],
                    *[F.col(n).alias(f"_c_{n}") for n, _ in mtypes])
                dimkeys = delta.select(
                    *[F.col(k).alias(f"_k_{k}") for k in self.dims]).distinct()
                semi = functools.reduce(operator.and_, [
                    F.col(f"_c_{k}").eqNullSafe(F.col(f"_k_{k}"))
                    for k in self.dims])
                cur_r = cur_r.join(dimkeys, semi, "left_semi")
                outer = functools.reduce(operator.and_, [
                    F.col(k).eqNullSafe(F.col(f"_c_{k}")) for k in self.dims])
                j = delta.join(cur_r, outer, "full_outer")
                out_dims = [F.coalesce(F.col(k), F.col(f"_c_{k}")).alias(k)
                            for k in self.dims]
                measures = [
                    (F.coalesce(F.col(n), F.lit(0).cast(t))
                     + F.coalesce(F.col(f"_c_{n}"), F.lit(0).cast(t)))
                    .cast(t).alias(n)
                    for n, t in mtypes]
            else:
                j = delta
                out_dims = [F.col(k) for k in self.dims]
                measures = [F.coalesce(F.col(n), F.lit(0).cast(t))
                            .cast(t).alias(n) for n, t in mtypes]
            merged = j.select(*out_dims, *measures).withColumn(
                "op",
                F.when(F.col("n_rows") == 0, F.lit("D")).otherwise(F.lit("U"))
            ).withColumn("seq_no", F.lit(v1).cast("long"))
            self.table.commit_delta_auto(merged, batch_id, lineage=lineage)
        finally:
            delta.unpersist()
            if keys is not None:
                keys.unpersist()
        return True

    def _measure_types(self) -> list[tuple[str, str]]:
        out = [("n_rows", "long")]
        for c in self.sum_cols:
            out.append((f"sum_{c}", _DEC))
            out.append((f"cnt_{c}", "long"))
        return out

    def _empty_commit_frame(self, spark: SparkSession) -> DataFrame:
        fields = ", ".join(
            [f"`{d}` string" for d in self.dims]
            + [f"`{n}` {t}" for n, t in self._measure_types()]
            + ["op string", "seq_no long"])
        return spark.createDataFrame([], fields)

    # --------------------------------------------------------------- read
    def read(self, spark: SparkSession) -> DataFrame | None:
        """The view as a user-facing frame: dims, ``n_rows``, and for each
        measure ``sum_{c}`` (NULL when the group holds no non-null values,
        matching SQL SUM)."""
        df = self.table.read_live(spark)
        if df is None:
            return None
        cols = [F.col(d) for d in self.dims] + [F.col("n_rows")]
        for c in self.sum_cols:
            cols.append(F.when(F.col(f"cnt_{c}") > 0, F.col(f"sum_{c}"))
                        .alias(f"sum_{c}"))
        return df.select(*cols)
