"""omop_meds_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Recasts the batch OMOP→MEDS ETL semantics of the reference
(rvandewater/OMOP_MEDS, surveyed in /root/repo/SURVEY.md) as a continuous
change-data-capture pipeline:

* a simulated binlog/WAL tail of insert/update/delete events over a
  source table of code repositories ``(repo, path, commit, lang, content)``,
* consumed in micro-batches, key-partitioned by ``(repo, path)`` with
  explicit salting for hot-repo skew,
* applied as idempotent MERGE-style (last-writer-wins) upserts into a
  snapshot-logged parquet table with exactly-once commits,
* with schema evolution (added / renamed / widened columns) handled by a
  target-schema registry, mirroring the reference's permissive shard
  alignment (reference: src/OMOP_MEDS/pre_meds_data_loader.py:341-507).

Everything is pyspark.sql DataFrame + vectorized pandas/Arrow UDFs; no
per-row Python in any hot path.
"""

__version__ = "0.1.0"
