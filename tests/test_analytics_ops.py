"""Semantic invariants for the round-2 analytics additions.

The oracle parity tests prove Spark == DuckDB; these prove both are
computing the thing the operator CLAIMS (probabilities normalize,
funnels are monotone, SCD2 intervals tile the timeline, ...) — the
invariant survives even if the oracle SQL were rewritten wrong the same
way as the query.
"""

from __future__ import annotations

from collections import defaultdict

from mbta_etl_spark.plans import registry
from tests.conftest import SF_DIR_SMALL


def test_q55_probabilities_normalize(spark):
    rows = registry.q55_transition_matrix(spark, SF_DIR_SMALL).collect()
    by_from = defaultdict(float)
    for r in rows:
        assert r.transitions >= 1
        assert 0.0 < r.prob <= 1.0
        by_from[r.from_type] += r.prob
    # scaled-floor rounds each term by <1e-6; a row set of ~5 terms can
    # drift the sum by at most 5e-6
    for ft, s in by_from.items():
        assert abs(s - 1.0) < 1e-5, (ft, s)


def test_q51_offset_zero_is_cohort_size(spark):
    rows = registry.q51_retention_cohorts(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.week_offset >= 0
        assert 0.0 < r.retention <= 1.0
        assert r.active_users <= r.cohort_users
        if r.week_offset == 0:
            # everyone is active in their own first week
            assert r.active_users == r.cohort_users


def test_q54_pairs_ordered_and_positive(spark):
    rows = registry.q54_pair_cooccurrence(spark, SF_DIR_SMALL).collect()
    assert 0 < len(rows) <= 20
    counts = [r.pair_cnt for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.part_a < r.part_b
        assert r.pair_cnt >= 1


def test_q56_funnel_monotone(spark):
    [r] = registry.q56_funnel_conversion(spark, SF_DIR_SMALL).collect()
    assert r.step1_users >= r.step2_users >= r.step3_users >= 0
    for c in (r.conv_12, r.conv_23, r.conv_13):
        assert c is None or 0.0 <= c <= 1.0


def test_q57_outliers_bounded(spark):
    rows = registry.q57_mad_outliers(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0.0
        assert 0 <= r.n_outliers <= r.n
        assert 0.0 <= r.outlier_frac <= 1.0


def test_j10_intervals_tile_per_user(spark):
    rows = registry.j10_scd2_intervals(spark, SF_DIR_SMALL).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    for uid, ivs in per_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per user, and it is the last
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # no gaps, no overlaps
            assert a.state != b.state  # runs were compressed


def test_v06_four_metrics_with_both_epochs(spark):
    rows = registry.v06_profile_drift(spark, SF_DIR_SMALL).collect()
    assert sorted(r.metric for r in rows) == [
        "avg_value",
        "click_share",
        "distinct_users",
        "row_count",
    ]
    for r in rows:
        assert r.epoch_a is not None and r.epoch_b is not None
        if r.metric in ("row_count", "distinct_users"):
            assert r.epoch_a > 0 and r.epoch_b > 0


def test_t14_lift_floor_and_order(spark):
    rows = registry.queries()["t14_bigram_lift"](spark, SF_DIR_SMALL).collect()
    assert 0 < len(rows) <= 20
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.n_ab >= 5
        assert r.lift > 0.0


def test_s09_mmr_diversifies(spark):
    """MMR keeps the top-relevance hit first and never repeats an id; the
    relevance sequence is NOT required to be monotone (that's the point),
    but every emitted rel must come from the candidate pool's top-50."""
    rows = registry.queries()["s09_mmr_rerank"](spark, SF_DIR_SMALL).collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 10
    s01 = registry.queries()["s01_cosine_topk"](spark, SF_DIR_SMALL).collect()
    # rank 1 == the globally most-relevant vector (λ only reweights later picks)
    assert ids[0] == s01[0].vec_id


def test_q58_streaks_are_maximal_runs(spark):
    rows = registry.q58_activity_streaks(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        span = (r.end_day - r.start_day).days + 1
        assert span == r.streak_days  # consecutive: no holes inside the run
        assert r.streak_days >= 1
    assert len({r.user_id for r in rows}) == len(rows)  # one row per user


def test_d13_audit_counts_consistent(spark):
    [r] = registry.queries()["d13_lsh_recall_audit"](
        spark, SF_DIR_SMALL
    ).collect()
    assert 0 <= r.n_both <= min(r.n_exact, r.n_lsh)
    if r.n_exact:
        assert r.recall == __import__("math").floor(
            r.n_both / r.n_exact * 1e6 + 0.5
        ) / 1e6


def test_ts11_mase_consistency(spark):
    rows = registry.ts11_mase(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_scored >= 1
        assert r.mae_season >= 0.0 and r.mae_naive >= 0.0
        if r.mase is not None and r.mae_naive:
            # mase is the SAE ratio; cross-check against the MAE ratio
            # within floor tolerance
            approx = r.mae_season / r.mae_naive
            assert abs(r.mase - approx) < 1e-3
