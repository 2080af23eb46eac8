"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin in DuckDB at the same SF, sort
columns by name, hash values, and report per-query match/mismatch.

Usage: python scripts/parity_sweep.py [SF_DIR] [query ...]
"""
from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from omop_meds_spark.session import get_spark

    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(os_[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
            ok_schema = sorted(scols) == sorted(ocols)
            ok_rows = len(srows) == len(orows)
            ok_hash = ok_schema and _hash_rows(scols, srows) == _hash_rows(ocols, orows)
            status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
            if status == "FAIL":
                fails.append(name)
            print(f"{status:4} {name:34} rows={len(srows)}/{len(orows)} "
                  f"schema={'=' if ok_schema else sorted(scols)!r} hash={'=' if ok_hash else 'X'}",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"ERR  {name:34} {type(ex).__name__}: {ex}", flush=True)
    print(f"\n{len(qs) - len(fails)}/{len(qs) if not only else len(only)} pass; fails: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
