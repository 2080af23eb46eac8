"""Driver-contract invariants that don't need Spark: every queries() entry
has an oracle twin (the correctness gate compares them 1:1), entry() is
importable, and oracle SQL parses in DuckDB against empty views with the
real testdata schemas (catches SQL typos/alias drift without running
Spark)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle_and_vice_versa():
    import __spark_entry__ as E

    q, o = set(E.queries()), set(E.oracle_sql())
    assert q == o, f"queries-only: {q - o}; oracles-only: {o - q}"


def test_oracle_sql_parses_and_projects_in_duckdb():
    """Zero-row views with the REAL schemas: every oracle must parse, bind
    its columns, and produce a result frame (schema-level execution) —
    a renamed column or bad alias fails here in milliseconds."""
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet' WHERE FALSE"
        )
    for name, sql in E.oracle_sql().items():
        cols = [d[0] for d in con.sql(sql).description]
        assert cols, name
        assert len(cols) == len(set(cols)), f"{name}: duplicate output columns {cols}"
