"""General conditional MERGE INTO (operators/merge.py).

The LWW upsert kernel covers the CDC hot path; these pin the ANSI MERGE
semantics of the general operator: branch precedence (DELETE before
UPDATE), unchanged pass-through for unmatched branches on both sides,
null-safe key matching, default take-all-source update_set, and
insert gating.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from omop_meds_spark.operators.merge import merge_into


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (None, "nk", 5)],
        "k int, tag string, val int")
    source = spark.createDataFrame(
        [(1, "a2", 99),      # matched, update fires (val > target)
         (2, "b2", 20),      # matched, no branch fires -> target unchanged
         (3, "c2", 0),       # matched, delete fires (val = 0)
         (None, "nk2", 50),  # null key matches null key (<=>), update
         (9, "new", 7)],     # source-only -> insert
        "k int, tag string, val int")
    return target, source


def test_merge_branches_and_null_keys(spark):
    target, source = _frames(spark)
    out = merge_into(
        target, source, ["k"],
        matched_delete=F.col("s.val") == 0,
        matched_update=F.col("s.val") > F.col("t.val"),
        update_set={"val": F.col("s.val")},  # tag keeps the TARGET value
    )
    assert out.columns == target.columns
    assert _rows(out) == {
        (1, "a", 99),      # updated val, target tag kept
        (2, "b", 20),      # unchanged (no branch)
        (None, "nk", 50),  # null-key match updated
        (9, "new", 7),     # inserted
    }  # k=3 deleted


def test_delete_wins_over_update(spark):
    target, source = _frames(spark)
    out = merge_into(
        target, source, ["k"],
        matched_delete=F.col("s.val") == 0,
        matched_update=F.lit(True),  # would also fire on k=3
        update_set={"val": F.col("s.val")},
    )
    assert not [r for r in out.collect() if r["k"] == 3]


def test_default_update_set_takes_all_source_columns(spark):
    target, source = _frames(spark)
    out = merge_into(
        target, source, ["k"],
        matched_update=F.lit(True),
    )
    got = {r["k"]: (r["tag"], r["val"]) for r in out.collect()}
    assert got[1] == ("a2", 99) and got[2] == ("b2", 20) and got[3] == ("c2", 0)


def test_insert_gating(spark):
    target, source = _frames(spark)
    no_ins = merge_into(target, source, ["k"], insert=False)
    assert not [r for r in no_ins.collect() if r["k"] == 9]
    cond_ins = merge_into(
        target, source, ["k"], insert_when=F.col("s.val") > 100)
    assert not [r for r in cond_ins.collect() if r["k"] == 9]
    # plan shape: one join, no window
    plan = merge_into(target, source, ["k"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


def test_merge_matches_oracle_locally(spark):
    """The registered query equals its DuckDB oracle at sf0.001 (the same
    comparison the driver runs at sf0.01)."""
    import duckdb

    from omop_meds_spark.oracles import ORACLES
    from omop_meds_spark.queries import ALL_QUERIES

    sf = "/root/testdata/sf0.001"
    got = ALL_QUERIES["merge_into_docs"](spark, sf).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = con.sql(ORACLES["merge_into_docs"]).df()
    key = sorted(got.columns)
    got_s = got[key].sort_values(key).reset_index(drop=True)
    exp_s = exp[key].sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s) > 0
    assert got_s.astype(str).equals(exp_s.astype(str))


def test_null_branch_condition_does_not_fire(spark):
    """ANSI MERGE: a branch condition evaluating to NULL does not fire —
    in particular a NULL matched_delete must NOT silently drop the row
    (regression: NULL used to propagate through `keep` and filter it)."""
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, tag string, val int")
    source = spark.createDataFrame(
        # tag NULL on k=1: delete and update conditions are both NULL
        [(1, None, 99), (2, "del", 0), (9, None, 7)],
        "k int, tag string, val int")
    out = merge_into(
        target, source, ["k"],
        matched_delete=F.col("s.tag") == "del",
        matched_update=F.col("s.tag") == "upd",
        update_set={"val": F.col("s.val")},
        insert=False,
    )
    assert _rows(out) == {(1, "a", 10)}  # k=1 kept unchanged, k=2 deleted

    # NULL insert_when gates the insert off, not an error / NULL row
    source2 = spark.createDataFrame(
        [(2, "del", 0), (9, None, 7)], "k int, tag string, val int")
    out2 = merge_into(
        target, source2, ["k"],
        matched_delete=F.col("s.tag") == "del",
        insert_when=F.col("s.tag").isNotNull(),
    )
    assert _rows(out2) == {(1, "a", 10)}  # k=9 (tag NULL) not inserted
