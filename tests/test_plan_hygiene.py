"""Fleet-wide physical-plan hygiene gate over EVERY registry entry.

test_plans.py pins specific shapes for representative queries; this
module enforces the class-level anti-pattern bans across all ~250
entries, so a new entry (or a refactor) can never silently introduce:

- ``BatchEvalPython`` / ``PythonUDF`` row-at-a-time evaluation — the
  slow path this engine bans in favor of JVM expressions and
  Arrow-batched kernels (``ArrowEvalPython``/``MapInPandas``/
  ``FlatMapGroupsInPandas`` are the sanctioned Python tiers);
- ``CartesianProduct`` — an unconstrained cross join that explodes at
  scale. Deliberate tiny scalar cross joins compile to
  ``BroadcastNestedLoopJoin`` with a 1-row broadcast side, which stays
  allowed.

Plans are compiled driver-side only (explain, no execution), so the
whole sweep is cheap.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR_SMALL

QUERIES = entrymod.queries()

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_free_of_antipatterns(spark, name):
    df = QUERIES[name](spark, SF_DIR_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    hits = [f for f in FORBIDDEN if f in plan]
    assert not hits, (
        f"{name}: physical plan contains banned operator(s) {hits} — "
        "use JVM expressions / Arrow-batched kernels instead of "
        "row-at-a-time Python, and an equi/broadcast join instead of a "
        "cartesian product"
    )
