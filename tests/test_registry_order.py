"""Registry-order guard: the driver's correctness harness checks the
FIRST 50 entries of queries() in iteration order. queries() reorders the
registry so entries without a green driver CORRECTNESS row
(``plans/registry._DRIVER_VERIFIED``) come first — the window rotates
onto ~50 fresh entries each round. These tests pin that invariant so an
accidental reorder can't silently strip entries of differential
verification (the round-1 failure mode).

Per-round maintenance: after CORRECTNESS_r{N}.json lands, append its
green names to ``_DRIVER_VERIFIED`` (leave red/errored rows out so they
are automatically re-checked next round).
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from mbta_etl_spark.plans.registry import _DRIVER_VERIFIED

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_driver_rows():
    """Union of all-green rows across every CORRECTNESS_r*.json present."""
    green: set[str] = set()
    red: set[str] = set()
    for fn in sorted(os.listdir(REPO)):
        if not (fn.startswith("CORRECTNESS_r") and fn.endswith(".json")):
            continue
        with open(os.path.join(REPO, fn)) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                # deliberate rows-only entry — the weaker gate ran; the
                # driver records spark_rows and nothing else to compare
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    row.get("err") is None
                    and row.get("rows_match")
                    and row.get("schema_match") is not False
                    and row.get("hash_match") is not False
                )
            (green if ok else red).add(name)
    # a later red row trumps an earlier green one only if it's the most
    # recent — keep it simple: red-ever means re-verify unless a LATER
    # green exists; CORRECTNESS files don't record order per name, so we
    # conservatively treat green-in-any-round as green (matches how
    # _DRIVER_VERIFIED is maintained by hand each round).
    return green


def test_window_contains_only_unverified_entries():
    """While unverified entries remain, none of the driver's 50 slots may
    be wasted on an already-green entry."""
    names = list(entrymod.queries())
    unverified = [n for n in names if n not in _DRIVER_VERIFIED]
    window = names[: min(50, len(names))]
    if len(unverified) >= 50:
        overlap = set(window) & _DRIVER_VERIFIED
        assert not overlap, (
            f"verified entries occupy driver window slots: {sorted(overlap)}"
        )
    # and the window must be exactly the FIRST unverified entries in
    # registration order — no unverified entry may jump the queue past
    # another silently
    assert window == unverified[: len(window)] or len(unverified) < 50


def test_unverified_pool_matches_correctness_files():
    """_DRIVER_VERIFIED must stay consistent with the CORRECTNESS_r*.json
    reports in the repo root: every name in the set has at least one
    all-green driver row, and no all-green name is missing from the set
    *unless* it was deliberately held out for re-verification (oracle or
    plan changed). Holdouts are enumerated here."""
    green = _green_driver_rows()
    # c04: r02 hash red (oracle HUGEINT typing, fixed round 3) — its only
    # rows were never all-green, so it's naturally outside green anyway.
    # The approx-sketch trio passed earlier rounds as rows-only entries
    # but gained composed oracles with NEW output schemas in round 5
    # (VERDICT r4 item 3) — held out so the driver re-verifies the new
    # shape end-to-end. s15_pca_eigen's old rows-only green is moot: the
    # entry was retired from the registry (s15a carries its oracle).
    deliberately_held_out: set[str] = {
        "q09a_percentiles_approx", "q24a_distinct_approx",
        "r02_sketch_rollup", "s15_pca_eigen",
    }
    phantom = _DRIVER_VERIFIED - green
    assert not phantom, (
        f"_DRIVER_VERIFIED contains names with no green driver row: "
        f"{sorted(phantom)}"
    )
    stale = (green - _DRIVER_VERIFIED) - deliberately_held_out
    assert not stale, (
        f"green driver rows missing from _DRIVER_VERIFIED (append them so "
        f"the window rotates): {sorted(stale)}"
    )


def test_round5_window_front_loads_risky_entries():
    """Round 5 stacks the driver window with the entries where
    Spark-vs-DuckDB drift is most likely (VERDICT r4 item 1): the
    round-4 additions that have never seen a driver check, the round-5
    additions, then the numeric/iterative audits."""
    from mbta_etl_spark.plans.registry import _WINDOW_PRIORITY

    names = list(entrymod.queries())
    window = set(names[:50])
    must_cover = {
        "d41_winnowing_pairs", "m15_jpeg_decode", "ts38_rolling_median",
        "q104_compress_consecutive", "t31_feature_hashing",
        "s15a_pca_invariants", "q105_pipe_syntax", "src12_orc_roundtrip",
        "d16_minhash_est_audit", "s11_ivf_recall_audit",
        "ts14_holt_linear", "v13_ks_test",
    }
    missing = must_cover - window
    assert not missing, f"risky entries not in driver window: {sorted(missing)}"
    # priority names still unverified must appear first, in priority
    # order (names not yet registered are filtered, matching queries())
    prio = [
        n for n in _WINDOW_PRIORITY
        if n not in _DRIVER_VERIFIED and n in set(names)
    ]
    # ... which also pins the driver window (names[:50]) to the priority
    # head whenever >= 50 priority names remain; any overflow
    # (deliberate: it leads next round's queue) stays ordered right
    # behind the window
    assert names[: len(prio)] == prio


def test_every_query_has_oracle_or_documented_exception():
    """Round 5 closed the last no-oracle gaps (VERDICT r4 item 3): the
    approx-sketch trio carries composed oracles (exact statistic +
    asserted in-bounds flag, the d13 pattern) and s15_pca_eigen was
    retired in favor of the oracle-checked s15a invariants — EVERY
    registry entry must now have a DuckDB oracle."""
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    rows_only = qs - oracles
    assert rows_only == set(), (
        f"unexpected rows-only entries: {sorted(rows_only)}"
    )
    assert not (oracles - qs), "orphan oracles with no query entry"


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's summary line must track the real registry — the
    count is bumped by hand with each new entry, and this pins it so the
    doc can't silently drift from the code."""
    import re

    with open("COVERAGE.md") as f:
        text = f.read()
    m = re.search(r"(\d+) registry entries; (\d+) oracle-checked", text)
    assert m, "COVERAGE.md summary line missing"
    n_entries, n_oracle = int(m.group(1)), int(m.group(2))
    assert n_entries == len(entrymod.queries())
    assert n_oracle == len(entrymod.oracle_sql())
