"""Differential oracle test — mirrors the driver's t2 correctness check.

For every entry in ``queries()`` with an ``oracle_sql()`` counterpart, run
the Spark plan and the DuckDB SQL on the same sf0.001 parquet and compare
row count, column names, and order-insensitive values. Catching a mismatch
here is strictly cheaper than waiting for the driver's round report.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def _canon_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_DIR_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, st_entry_once, name):
    if name.startswith("st"):
        # streaming entries execute their replay inside the call — run
        # once per suite session and share with test_plan_hygiene
        sdf = st_entry_once(name, QUERIES[name])
    else:
        sdf = QUERIES[name](spark, SF_DIR_SMALL)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        # rows-only check, like the driver's weaker gate
        assert len(spark_rows) >= 0
        return

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    # The driver canonicalizes the oracle side through pandas
    # (``fetchdf``), where DuckDB HUGEINT / widened numerics materialize
    # as float64 and stringify as "32.0" vs Spark's "32".  ``fetchall``
    # alone (exact Python ints) is laxer than the driver, so also check
    # that no integral Spark column comes back floating from pandas.
    pdf = duck.execute(ORACLES[name]).fetchdf()
    pdf.columns = [c.lower() for c in pdf.columns]
    integral = {
        f.name.lower()
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("byte", "short", "integer", "long")
    }
    for col in pdf.columns:
        if col in integral and pdf[col].dtype.kind == "f":
            # nullable BIGINT legitimately widens to float64 in pandas;
            # only flag when the column is fully non-null (pure typing).
            if not pdf[col].isna().any():
                pytest.fail(
                    f"{name}: oracle column {col!r} materializes as "
                    f"{pdf[col].dtype} via pandas while Spark returns an "
                    "integral type — the driver's hash will mismatch "
                    "(HUGEINT/widening class; CAST the oracle column)"
                )

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    sc = _canon_rows(spark_rows, spark_cols)
    dc = _canon_rows(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first value mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns
