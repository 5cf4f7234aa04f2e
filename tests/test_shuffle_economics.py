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


def test_s25_hamming_topk_take_ordered_not_global_sort(spark):
    """The packed-Hamming top-k must be a TakeOrderedAndProject: at most
    k rows per partition reach the driver-side heap — never a global
    sort of the corpus."""
    from mbta_etl_spark.plans import llm_registry

    m = plan_audit.audit(llm_registry.s25_hamming_topk(spark, SF_DIR_SMALL))
    assert m["rows_scanned"] >= 400
    assert m["shuffle_records"] <= 64
    assert m["spill_bytes"] == 0


def test_ts37_m4_is_one_partial_aggregate(spark):
    """M4's four extremes ride ONE map-side-combinable aggregate: the
    shuffle carries (key, bucket) partials, with zero spill and no
    second exchange for a window."""
    from mbta_etl_spark.plans import registry

    m = plan_audit.audit(
        registry.ts37_m4_downsample(spark, SF_DIR_SMALL)
    )
    assert m["rows_scanned"] >= 900
    # one Exchange of bucket partials; never more rows than the scan
    assert m["shuffle_records"] <= m["rows_scanned"]
    assert m["spill_bytes"] == 0
