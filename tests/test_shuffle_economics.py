"""Measured shuffle economics: execute representative entries and assert
on the REAL Exchange counters from the final (post-AQE) plan — not the
plan shape, the bytes. Pins the map-side-combine and broadcast claims
SCALE.md makes: a regression that silently turns a partial aggregate
into a full-row shuffle, or a broadcast join into a shuffle join, fails
here even though results stay correct."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_audit)

from tests.conftest import SF_DIR_SMALL  # noqa: E402


def test_q16_shuffles_groups_not_rows(spark):
    """TPC-H-Q1 shape: the partial aggregate must reduce the shuffle to
    ~#groups × #map-partitions records — orders of magnitude below the
    scanned row count — with zero spill."""
    from mbta_etl_spark.plans import registry

    m = plan_audit.audit(registry.q16_pricing_summary(spark, SF_DIR_SMALL))
    assert m["rows_scanned"] >= 1000
    # 6 groups; allow one partial record per group per shuffle partition
    assert m["shuffle_records"] <= 6 * 32 * 2
    assert m["shuffle_records"] * 50 <= m["rows_scanned"]
    assert m["spill_bytes"] == 0


def test_j07_salted_join_broadcasts_light_side(spark):
    """The salted join's heavy side must NOT be shuffled: only the
    exploded light side moves (broadcast), so shuffle records stay far
    below the scanned fact rows."""
    from mbta_etl_spark.plans import registry

    m = plan_audit.audit(registry.j07_salted_join(spark, SF_DIR_SMALL))
    assert m["rows_scanned"] >= 1000
    assert m["shuffle_records"] * 100 <= m["rows_scanned"]
    assert m["spill_bytes"] == 0
