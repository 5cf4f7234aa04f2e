"""Validation operators: constraint checks must DETECT violations (the
testdata is clean, so parity alone can't prove that), and snapshot diff
must classify added/removed/changed/unchanged incl. null-safe compares."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbta_etl_spark.operators import validate


def test_constraints_detect_each_violation_kind(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 50.0), (None, 99.0)],
        ["k", "v"],
    )
    out = {
        r["rule"]: r
        for r in validate.check_constraints(
            df, not_null=["k"], unique=["k"], ranges=[("v", 0.0, 100.0)]
        ).collect()
    }
    assert out["not_null:k"]["violations"] == 1
    assert not out["not_null:k"]["ok"]
    # COUNT(k)=3 non-null, 2 distinct → 1 duplicate
    assert out["unique:k"]["violations"] == 1
    assert out["range:v:[0.0,100.0]"]["violations"] == 1
    assert all(r["n_rows"] == 4 for r in out.values())


def test_constraints_clean_table_all_ok(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"])
    out = validate.check_constraints(
        df, not_null=["k", "v"], unique=["k"], ranges=[("v", 0.0, 10.0)]
    ).collect()
    assert all(r["ok"] and r["violations"] == 0 for r in out)


def test_constraints_empty_table(spark):
    """Zero rows → zero violations, every rule ok (vacuous truth), and
    n_rows reports 0 — the report stays well-formed."""
    df = spark.createDataFrame([], "k: bigint, v: double")
    out = validate.check_constraints(
        df, not_null=["k"], unique=["k"], ranges=[("v", 0.0, 1.0)]
    ).collect()
    assert len(out) == 3
    assert all(r["ok"] and r["violations"] == 0 and r["n_rows"] == 0 for r in out)


def test_referential_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (1,), (2,), (9,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    row = validate.check_referential(
        child, F.col("fk"), parent, F.col("pk")
    ).collect()[0]
    assert row["n_orphans"] == 1 and row["n_child"] == 4


def test_apply_changelog_merge_semantics(spark):
    """CDC apply: delete removes, upsert replaces, new key inserts,
    untouched keys survive, and only the LATEST change per key counts."""
    from pyspark.sql import functions as F

    from mbta_etl_spark.operators.core import apply_changelog

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 1, 11.0),   # update k=1
            (2, "D", 1, 0.0),    # delete k=2 ...
            (2, "U", 2, 22.0),   # ... but a later upsert wins
            (4, "U", 1, 44.0),   # insert new key
            (5, "U", 1, 55.0),   # insert then ...
            (5, "D", 2, 0.0),    # ... later delete wins: never appears
        ],
        ["k", "op", "seq", "v"],
    )
    out = {
        r["k"]: r["v"]
        for r in apply_changelog(
            base, changes, "k", "op", [F.desc("seq")], ["v"]
        ).collect()
    }
    assert out == {1: 11.0, 2: 22.0, 3: 30.0, 4: 44.0}


def test_snapshot_diff_classifies_all_cases(spark):
    old = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None), (4, 4.0)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, 1.0), (2, 20.0), (3, None), (5, 5.0)], ["k", "v"]
    )
    out = {
        r["k"]: r["change"]
        for r in validate.snapshot_diff(old, new, "k", ["v"]).collect()
    }
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL under null-safe equality
        4: "removed",
        5: "added",
    }


def test_quarantine_split_first_fail_wins(spark):
    from pyspark.sql import functions as F

    from mbta_etl_spark.operators.validate import quarantine_split

    df = spark.createDataFrame(
        [(1, 5, "ok"), (2, -1, "ok"), (3, -1, "bad"), (4, 5, "bad")],
        "id long, v long, s string",
    )
    out = {
        r["id"]: (r["quarantine_reason"], r["is_clean"])
        for r in quarantine_split(
            df,
            [
                ("v_positive", F.col("v") > 0),
                ("s_ok", F.col("s") == "ok"),
            ],
        ).collect()
    }
    assert out[1] == (None, True)
    assert out[2] == ("v_positive", False)
    assert out[3] == ("v_positive", False)  # first failing rule wins
    assert out[4] == ("s_ok", False)


def test_v22_duplicate_rows_covers_all_tables(spark):
    from mbta_etl_spark.plans.registry import V22_TABLES, v22_duplicate_rows
    from tests.conftest import SF_DIR_SMALL

    rows = {r.tbl: r for r in v22_duplicate_rows(spark, SF_DIR_SMALL).collect()}
    assert set(rows) == set(V22_TABLES)
    for r in rows.values():
        assert r.n_rows >= r.n_distinct >= 0
        assert r.n_dup_rows == r.n_rows - r.n_distinct
    # tables with a unique generated key can't hold full-row duplicates
    assert rows["events"].n_dup_rows == 0
    assert rows["orders"].n_dup_rows == 0


def test_observed_metrics_match_direct_aggregates(spark):
    """The Observation-API counters equal a direct aggregate pass —
    the metrics really describe the observed job's input."""
    from mbta_etl_spark.plans.registry import _events, v23_observed_metrics
    from tests.conftest import SF_DIR_SMALL

    from pyspark.sql import functions as F

    got = v23_observed_metrics(spark, SF_DIR_SMALL).collect()[0]
    ev = _events(spark, SF_DIR_SMALL)
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("neg"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    ).collect()[0]
    assert got.n_rows == direct.n
    assert got.n_negative_value == (direct.neg or 0)
    assert got.min_ts == direct.mn and got.max_ts == direct.mx
    assert got.n_null_type == 0


def test_observed_metrics_empty_input_degrades_to_nulls(spark, tmp_path):
    """ADVICE r3: an empty events table yields (0, NULL, NULL, NULL,
    NULL) — the same row the SQL oracle's empty-input aggregates
    produce — instead of AttributeError on None.isoformat()."""
    from mbta_etl_spark.plans.registry import _events, v23_observed_metrics
    from tests.conftest import SF_DIR_SMALL

    empty_dir = str(tmp_path / "sf_empty")
    _events(spark, SF_DIR_SMALL).limit(0).write.parquet(
        f"{empty_dir}/events.parquet"
    )
    got = v23_observed_metrics(spark, empty_dir).collect()[0]
    assert got.n_rows == 0
    assert got.n_negative_value is None and got.n_null_type is None
    assert got.min_ts is None and got.max_ts is None
