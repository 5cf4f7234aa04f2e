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
whole sweep is cheap — with one documented exception: the streaming
equivalence entries (st01–st10) EXECUTE their replay inside the entry
call (a streaming query cannot be compiled without running), so for
them this gate sees only the final standing-table read. Since round 6
their replay runs ONCE per suite session via the shared
``st_entry_once`` fixture (test_parity, which sorts earlier, usually
pays it), so this module is back to pure-compile cost with no coverage
loss. Their INNER streamed computations are the same operator
functions / expressions pinned by batch twins elsewhere: st01 =
operators/dedup.exact_dedup_groups (d01's plan), st02 =
operators/rollup.rollup_increment/rollup_merge (r01's plan), st03 =
operators/frequent.mg_summarize/mg_merge (guarantee pinned by
tests/test_frequent_and_r2b.py and the hypothesis property in
tests/test_properties.py), st04 = the shared _session_window_agg
expression (q18a's plan), st05/st06 = the interval-overlap predicate
j08's oracle replays (st06 adds the left_outer variant), st07 = the
applyInPandasWithState GroupState kernel (Arrow tier, explicitly
whitelisted; batch-twin oracle is the trivial GROUP BY), st08 =
ingest.dedup_stream_by_key (unit-pinned first-arrival semantics),
st09 = ingest.enrich_stream (unit-pinned stateless broadcast), st10 =
stateful.running_extrema_stream (ValueState tier, unit-pinned incl. a
RocksDB run) — so an
anti-pattern creeping into those operators is still caught through
the batch entries that share them.
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entrymod
from mbta_etl_spark.plans.planmetrics import plan_text, shape_metrics
from tests.conftest import SF_DIR_SMALL

QUERIES = entrymod.queries()

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")

_SNAP_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans_snapshot.json",
)
with open(_SNAP_PATH) as _f:
    SNAPSHOT: dict[str, dict[str, int]] = json.load(_f)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_free_of_antipatterns(spark, st_entry_once, name):
    if name.startswith("st"):
        # pre-execution plan captured at entry creation — a collect by
        # test_parity would otherwise flip explain to the AQE final plan
        plan = st_entry_once(name, QUERIES[name], want="plan")
    else:
        plan = plan_text(QUERIES[name](spark, SF_DIR_SMALL))
    hits = [f for f in FORBIDDEN if f in plan]
    assert not hits, (
        f"{name}: physical plan contains banned operator(s) {hits} — "
        "use JVM expressions / Arrow-batched kernels instead of "
        "row-at-a-time Python, and an equi/broadcast join instead of a "
        "cartesian product"
    )
    # plan-SHAPE regression gate: operator counts must match the
    # committed fingerprint (plans_snapshot.json). A mismatch means the
    # physical plan changed — a broadcast degrading to sort-merge, a new
    # shuffle, a Python stage in a JVM pipeline. If the change is
    # deliberate, regenerate with scripts/plan_snapshot.py, review the
    # diff, and commit it alongside the code change.
    assert name in SNAPSHOT, (
        f"{name}: no plan fingerprint — run scripts/plan_snapshot.py"
    )
    got = shape_metrics(plan)
    assert got == SNAPSHOT[name], (
        f"{name}: physical-plan shape drifted from plans_snapshot.json\n"
        f"  snapshot: {SNAPSHOT[name]}\n"
        f"  current : {got}\n"
        "deliberate change? regenerate via scripts/plan_snapshot.py and "
        "commit the reviewed diff"
    )


def test_snapshot_has_no_orphans():
    orphans = set(SNAPSHOT) - set(QUERIES)
    assert not orphans, (
        f"plans_snapshot.json names entries that no longer exist: "
        f"{sorted(orphans)} — regenerate via scripts/plan_snapshot.py"
    )
