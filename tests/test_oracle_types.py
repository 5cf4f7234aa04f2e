"""Class-level oracle dtype gate.

Round 2's one red CORRECTNESS row (``c04_chunk_pack``) came from a DuckDB
window-``SUM`` widening BIGINT to HUGEINT; the driver's pandas
materialization turned the HUGEINT columns into float64 and the stringified
value hash diverged from Spark's ints.  One-off CASTs (q25, q44, c04) don't
hold as oracles are added, so this sweep asserts the *class* can never
recur: no oracle may produce a HUGEINT/UHUGEINT column, and no oracle
column may round-trip through pandas with a dtype the driver would
stringify differently than exact Python values.

Cheap by design: DuckDB relation ``.types`` only — no Spark session — so
it runs in seconds over all oracles and can sit in every CI invocation.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB logical types that pandas cannot hold losslessly as the matching
# Spark type — each stringifies differently after fetchdf() and breaks the
# driver's value hash.  DECIMAL is banned for the inverse reason (found by
# v21: untyped VALUES float literals infer DECIMAL, whose exact fetchall()
# repr keeps trailing zeros "0.096910" vs Spark's double "0.09691") — it
# happens to survive the driver's pandas path but diverges under any exact
# comparison, so oracles must CAST literals/divisions to DOUBLE explicitly.
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "DECIMAL"}

ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(SF_DIR_SMALL, t)}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_no_widened_types(duck, name):
    rel = duck.sql(ORACLES[name])
    flagged = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ).upper().split("(")[0] in _FORBIDDEN
    ]
    assert not flagged, (
        f"{name}: oracle columns {flagged} use DuckDB types that pandas "
        "materializes as float64 — the driver's hash will mismatch even "
        "when Spark values are correct. CAST them (usually AS BIGINT)."
    )
