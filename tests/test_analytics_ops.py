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


def test_ts12_ohlc_invariants(spark):
    rows = registry.ts12_ohlc(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.low_value <= r.high_value
        assert r.low_value <= r.open_value <= r.high_value
        assert r.low_value <= r.close_value <= r.high_value
        assert r.n_obs >= 1
        if r.n_obs == 1:
            assert r.open_value == r.close_value == r.high_value == r.low_value


def test_v07_benford_is_census(spark):
    rows = registry.v07_benford(spark, SF_DIR_SMALL).collect()
    assert len(rows) == 9  # zero-filled digit spine
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    total_obs = sum(r.obs_share for r in rows)
    total_exp = sum(r.exp_share for r in rows)
    assert abs(total_obs - 1.0) < 1e-5
    assert abs(total_exp - 1.0) < 1e-5  # Benford expectations telescope to 1
    for r in rows:
        assert r.chi2_term >= 0.0


def test_q59_unpivot_shape(spark):
    wide_groups = (
        registry._events(spark, SF_DIR_SMALL)
        .select("event_type").distinct().count()
    )
    rows = registry.q59_unpivot(spark, SF_DIR_SMALL).collect()
    assert len(rows) == 3 * wide_groups
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r.event_type][r.metric] = r.metric_value
    for _, m in by_type.items():
        assert set(m) == {"avg_value", "min_value", "max_value"}
        assert m["min_value"] <= m["avg_value"] <= m["max_value"]


def test_t15_js_bounds(spark):
    from mbta_etl_spark.plans import llm_registry
    import math

    row = llm_registry.t15_js_divergence(spark, SF_DIR_SMALL).collect()[0]
    # JS divergence is bounded by ln(2) and non-negative; the two parity
    # epochs of one corpus should be far from disjoint
    assert 0.0 <= row.js_nats <= math.log(2.0) + 1e-9
    assert row.js_nats < 0.5 * math.log(2.0)
    assert row.vocab_size > 0
    assert row.n_tokens_epoch0 + row.n_tokens_epoch1 > 0


def test_s10_quant_error_bounded_by_half_step(spark):
    from mbta_etl_spark.plans import llm_registry

    rows = llm_registry.s10_int8_quant(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.v_lo <= r.v_hi
        half_step = (r.v_hi - r.v_lo) / 255.0 / 2.0
        # quantization to the nearest of 256 levels cannot miss by more
        # than half a step (plus the 6dp reporting round)
        assert r.max_abs_err_q8 <= half_step + 1e-6
        assert 0.0 <= r.mse_q8 <= r.max_abs_err_q8 ** 2 + 1e-6


def test_q60_disc_is_real_value_cont_between(spark):
    ev_vals = {
        t.event_type: set()
        for t in registry._events(spark, SF_DIR_SMALL)
        .select("event_type").distinct().collect()
    }
    for r in registry._events(spark, SF_DIR_SMALL).select(
        "event_type", "value"
    ).collect():
        ev_vals[r.event_type].add(r.value)
    rows = registry.q60_percentile_battery(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        # disc percentiles are actual data values; cont may interpolate
        assert r.p50_disc in ev_vals[r.event_type]
        assert r.p90_disc in ev_vals[r.event_type]
        assert r.p50_cont <= r.p90_cont
        lo, hi = min(ev_vals[r.event_type]), max(ev_vals[r.event_type])
        assert lo <= r.p50_cont <= hi


def test_g01_pagerank_mass_and_positivity(spark):
    rows = registry.g01_pagerank(spark, SF_DIR_SMALL).collect()
    assert rows
    n = len(rows)
    base = (1.0 - registry.PAGERANK_DAMPING) / n
    total = 0.0
    for r in rows:
        assert r.rank >= base - 1e-9  # teleport floor
        total += r.rank
    # every node here has out-edges (transition graph is dense), so rank
    # mass is conserved up to per-iteration rounding drift
    assert abs(total - 1.0) < 1e-3


def test_v08_pk_fd_holds_others_fail(spark):
    rows = {r.fd: r for r in registry.v08_fd_audit(spark, SF_DIR_SMALL).collect()}
    assert rows["o_orderkey->o_orderstatus"].n_violating == 0
    assert rows["o_orderkey->o_orderstatus"].violation_share == 0.0
    assert rows["o_custkey->o_orderpriority"].n_violating > 0
    assert rows["o_orderpriority->o_orderstatus"].n_violating > 0
    for r in rows.values():
        assert 0 <= r.n_violating <= r.n_groups


def test_t17_confusion_shares_normalize(spark):
    from mbta_etl_spark.plans import llm_registry

    rows = llm_registry.t17_langid_confusion(spark, SF_DIR_SMALL).collect()
    assert rows
    by_actual = defaultdict(float)
    for r in rows:
        assert r.n >= 1
        by_actual[r.lang] += r.share_of_actual
    for lang, s in by_actual.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_t16_entropy_bounded_by_log_vocab(spark):
    import math

    from mbta_etl_spark.plans import llm_registry

    row = llm_registry.t16_corpus_entropy(spark, SF_DIR_SMALL).collect()[0]
    assert 0.0 < row.entropy_nats <= math.log(row.vocab_size) + 1e-6
    # perplexity is the effective vocab: between 1 and the true vocab
    assert 1.0 <= row.perplexity <= row.vocab_size
    assert 0.0 < row.type_token_ratio <= 1.0


def test_s11_recall_bounds(spark):
    from mbta_etl_spark.plans import llm_registry

    row = llm_registry.s11_ivf_recall_audit(spark, SF_DIR_SMALL).collect()[0]
    assert row.n_both <= min(row.n_exact, row.n_ivf)
    assert 0.0 <= row.recall_at_k <= 1.0


def test_j11_states_only_from_changelog_types(spark):
    rows = registry.j11_scd2_enrich(spark, SF_DIR_SMALL).collect()
    assert rows
    states = {r.state_at_event for r in rows}
    assert states <= {"signup", "purchase", None}
    # facts never include changelog types, and some user has pre-history
    ev = registry._events(spark, SF_DIR_SMALL)
    n_facts = ev.filter(
        ~ev.event_type.isin(*registry.SCD2_STATE_TYPES)
    ).count()
    assert len(rows) == n_facts


def test_q61_quintiles_balanced_and_labeled(spark):
    rows = registry.q61_rfm_segments(spark, SF_DIR_SMALL).collect()
    assert rows
    from collections import Counter

    for col in ("r_score", "f_score", "m_score"):
        c = Counter(getattr(r, col) for r in rows)
        assert set(c) == {1, 2, 3, 4, 5}
        assert max(c.values()) - min(c.values()) <= 1  # ntile balance
    for r in rows:
        assert r.segment == f"{r.r_score}-{r.f_score}-{r.m_score}"
        assert r.recency_days >= 0 and r.frequency >= 1


def test_m07_audio_features_deterministic_and_bounded(spark):
    from mbta_etl_spark.plans import llm_registry

    rows = llm_registry.m07_audio_features(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.sample_rate in {8000, 16000, 24000, 32000, 40000, 48000}
        assert r.n_samples > 0
        assert abs(r.duration_s - round(r.n_samples / r.sample_rate, 6)) < 2e-6
        for b in (r.band_e0, r.band_e1, r.band_e2, r.band_e3):
            assert 0.0 <= b <= 1.0


def test_q62_trailing_frame_includes_self(spark):
    rows = registry.q62_trailing_hour_window(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.trailing_1h_n >= 1  # RANGE frame always includes self
        # sum includes at least this row's own value
        if r.trailing_1h_n == 1:
            assert abs(r.trailing_1h_sum - round(r.value, 6)) < 2e-6


def test_k02_profile_covers_all_members(spark):
    from mbta_etl_spark.plans import llm_registry
    from tests.conftest import SF_DIR_SMALL as SF

    total = spark.read.parquet(SF + "/embeddings.parquet").count()
    rows = llm_registry.k02_cluster_profile(spark, SF).collect()
    assert sum(r.n_members for r in rows) == total
    for r in rows:
        assert 0.0 <= r.mean_dist <= r.max_dist + 1e-9
        assert r.inertia >= 0.0


def test_c13_fill_never_exceeds_one_without_oversize(spark):
    from mbta_etl_spark.plans import llm_registry

    rows = llm_registry.c13_pack_efficiency(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_bins <= r.n_docs
        assert r.waste_tokens >= 0
        if r.n_oversize_bins == 0:
            assert r.avg_fill_ratio <= 1.0 + 1e-9


def test_q98_cumulative_distinct_invariants(spark):
    rows = registry.q98_cumulative_distinct(spark, SF_DIR_SMALL).collect()
    assert rows, "events must span at least one day"
    prev_cum = 0
    total_new = 0
    for r in rows:  # already ordered by day
        assert 0 <= r.n_new <= r.n_active, (r.day, r.n_new, r.n_active)
        assert r.cum_users == prev_cum + r.n_new
        prev_cum = r.cum_users
        total_new += r.n_new
    # cumulative total equals the corpus-wide distinct user count
    from mbta_etl_spark.sources.tables import load_table

    n_users = (
        load_table(spark, SF_DIR_SMALL, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[-1].cum_users == total_new == n_users
    # day one: everyone active is new
    assert rows[0].n_new == rows[0].n_active


def test_v20_freshness_lag_median_split(spark):
    rows = registry.v20_freshness_lag(spark, SF_DIR_SMALL).collect()
    n = len(rows)
    assert n >= 3
    lags = sorted(r.lag_s for r in rows)
    med = rows[0].median_lag_s
    assert all(r.median_lag_s == med for r in rows)
    # the freshest stream defines the watermark: one zero-lag row
    assert min(lags) == 0
    # median is the discrete lower-median element of the lag multiset
    assert med == lags[(n - 1) // 2]
    for r in rows:
        assert r.stale == (1 if r.lag_s > med else 0)
    # by construction at most half the rows sit strictly above the median
    assert sum(r.stale for r in rows) <= n // 2


def test_src10_txn_log_time_travel_semantics(spark):
    """v0: all 16 files live. v1 (compaction): 7 fewer files but row and
    byte mass conserved. v2 (delete of file 9): strictly less mass."""
    rows = {
        r.version: r
        for r in registry.src10_txn_log(spark, SF_DIR_SMALL).collect()
    }
    assert set(rows) == {0, 1, 2}
    v0, v1, v2 = rows[0], rows[1], rows[2]
    assert v0.n_live_files == 16
    # compaction: 16 - 8 removed + 1 merged = 9 files, identical mass
    assert v1.n_live_files == 9
    assert v1.n_rows == v0.n_rows and v1.n_bytes == v0.n_bytes
    # delete shrinks the table
    assert v2.n_live_files == 8
    assert v2.n_rows < v1.n_rows and v2.n_bytes < v1.n_bytes


def test_v21_benford_digits_complete_and_normalized(spark):
    rows = registry.v21_benford_audit(spark, SF_DIR_SMALL).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-5
    # expected fractions are the pinned Benford constants, sum to 1
    assert abs(sum(r.exp_frac for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.exp_frac > 0 and r.chi2_term >= 0.0
    # Benford is monotone decreasing in the expectation
    exps = [r.exp_frac for r in rows]
    assert exps == sorted(exps, reverse=True)


def test_q99_deciles_monotone_lift(spark):
    rows = registry.q99_revenue_deciles(spark, SF_DIR_SMALL).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # ntile balance: bucket sizes differ by at most 1
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # decile 1 is the top spenders: revenue shares non-increasing
    shares = [r.revenue_share for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(shares, shares[1:]))
    # cumulative share is monotone and ends at 1
    cums = [r.cum_share for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-5
    # concentration: the top decile holds more than 10% of revenue
    assert shares[0] > 0.1


def test_g05_co_engagement_bounds(spark):
    rows = registry.g05_co_engagement(spark, SF_DIR_SMALL).collect()
    assert rows, "types must co-occur"
    for r in rows:
        assert r.type_a < r.type_b  # canonical pair orientation, no dupes
        assert 0 < r.co_users <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0
        assert r.lift > 0.0
    # 5 event types → at most C(5,2)=10 pairs
    assert len(rows) <= 10


def test_q100_mode_is_the_argmax_bucket(spark):
    from mbta_etl_spark.sources.tables import load_table

    rows = registry.q100_mode_per_group(spark, SF_DIR_SMALL).collect()
    assert rows
    # independently recompute the (type, bucket) counts and check argmax
    import collections

    raw = (
        load_table(spark, SF_DIR_SMALL, "events")
        .selectExpr("event_type", "CAST(FLOOR(value) AS LONG) AS bucket")
        .collect()
    )
    counts = collections.Counter((r.event_type, r.bucket) for r in raw)
    per_type = collections.defaultdict(dict)
    for (t, b), n in counts.items():
        per_type[t][b] = n
    for r in rows:
        best_n = max(per_type[r.event_type].values())
        best_buckets = [
            b for b, n in per_type[r.event_type].items() if n == best_n
        ]
        assert r.mode_n == best_n
        assert r.mode_bucket == min(best_buckets)  # lowest-bucket tiebreak
        assert 0.0 < r.mode_share <= 1.0


def test_q101_two_phase_prefix_sum_matches_naive(spark):
    """The partitioned two-phase prefix equals a naive global cumsum
    recomputed driver-side, and has no single-partition event window
    in its plan (every window is partitioned by day)."""
    from mbta_etl_spark.sources.tables import load_table

    out = registry.q101_global_running_total(spark, SF_DIR_SMALL).collect()
    raw = (
        load_table(spark, SF_DIR_SMALL, "events")
        .selectExpr(
            "event_id", "ts", "CAST(FLOOR(value * 100 + 0.5) AS LONG) AS c"
        )
        .collect()
    )
    naive = {}
    acc = 0
    for r in sorted(raw, key=lambda r: (r.ts, r.event_id)):
        acc += r.c
        naive[r.event_id] = acc
    assert len(out) == len(raw)
    for r in out:
        assert r.running_cents == naive[r.event_id]
    # final value equals the global total
    assert out[-1].running_cents == acc


def test_g06_kcore_census_monotone_and_converged_flag(spark):
    """Census shrinks monotonically; the converged flag is exactly
    'last two rounds kept the same edge count'; k is the half-mean
    degree of the round-0 graph."""
    from mbta_etl_spark.plans.registry import KCORE_ROUNDS, g06_kcore_census
    from tests.conftest import SF_DIR_SMALL

    rows = sorted(
        g06_kcore_census(spark, SF_DIR_SMALL).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == list(range(KCORE_ROUNDS + 1))
    edges = [r.n_edges for r in rows]
    nodes = [r.n_nodes for r in rows]
    assert edges == sorted(edges, reverse=True)
    assert nodes == sorted(nodes, reverse=True)
    k = rows[0].k
    assert k == (edges[0] + nodes[0] - 1) // nodes[0]
    assert all(r.k == k for r in rows)
    assert rows[0].converged == (edges[-1] == edges[-2])


def test_equidepth_histogram_balanced_and_covering(spark):
    """Buckets partition the value domain without overlap, row mass per
    bucket is within one tie-group of n/k, and totals reconcile."""
    from mbta_etl_spark.plans.registry import (
        EQUIDEPTH_BUCKETS,
        q102_equidepth_histogram,
    )
    from mbta_etl_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_SMALL

    rows = sorted(
        q102_equidepth_histogram(spark, SF_DIR_SMALL).collect(),
        key=lambda r: r.bucket,
    )
    li = load_table(spark, SF_DIR_SMALL, "lineitem")
    n = li.count()
    assert sum(r.n_rows for r in rows) == n
    assert len(rows) <= EQUIDEPTH_BUCKETS
    for a, b in zip(rows, rows[1:]):
        assert a.hi < b.lo  # disjoint, ordered ranges
    target = n / EQUIDEPTH_BUCKETS
    # equal-height within tie tolerance: no bucket more than 2x target
    assert max(r.n_rows for r in rows) <= 2 * target


def test_price_volume_mix_additive_identity(spark):
    """Volume effect + price effect reconstructs the revenue delta to
    the pinning grid — the whole point of the decomposition."""
    from mbta_etl_spark.plans.registry import q103_price_volume_mix
    from tests.conftest import SF_DIR_SMALL

    rows = q103_price_volume_mix(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert abs((r.volume_effect + r.price_effect) - r.delta_rev) < 1e-4
        assert r.qty > 0 and r.rev_cents > 0


def test_assortativity_known_graphs(spark):
    """A star graph is maximally disassortative (r = -1); the registry
    entry lands in [-1, 1] on the real projection."""
    from mbta_etl_spark.plans.registry import g07_assortativity
    from tests.conftest import SF_DIR_SMALL

    r = g07_assortativity(spark, SF_DIR_SMALL).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_endpoints > 0 and r.n_endpoints % 2 == 0


def test_j06_cogroup_funnel_empty_side_buckets(spark):
    """ADVICE r8: a bucket where one cogroup side is EMPTY must still
    emit correctly-typed rows (the union Index degrades to object
    dtype there). Two lone users land in buckets whose other side is
    empty; a fully empty purchase stream is the degenerate case."""
    import datetime as dt

    from mbta_etl_spark.operators.windows import cogroup_funnel

    t0 = dt.datetime(2024, 1, 1)
    c = spark.createDataFrame([(1, t0)], "user_id long, ts timestamp_ntz")
    p = spark.createDataFrame([(2, t0)], "user_id long, ts timestamp_ntz")
    out = {
        r.user_id: (r.clicks_before_purchase, r.has_purchase)
        for r in cogroup_funnel(c, p, "user_id", "ts").collect()
    }
    assert out == {1: (0, False), 2: (0, True)}
    p0 = spark.createDataFrame([], "user_id long, ts timestamp_ntz")
    out0 = {
        r.user_id: (r.clicks_before_purchase, r.has_purchase)
        for r in cogroup_funnel(c, p0, "user_id", "ts").collect()
    }
    assert out0 == {1: (0, False)}


def test_j06_cogroup_funnel_bucketed_per_user_semantics(spark):
    """Round-8: the cogroup funnel's key became a 64-way hash bucket
    with the per-user logic vectorized inside the kernel. Pin the
    per-user semantics against a hand-built fixture dense enough that
    buckets hold many users (200 users >> 64 buckets): clicks strictly
    before the user's FIRST purchase count; users with no purchase
    report (0, False); purchase-only users report (0, True)."""
    import datetime as dt

    from mbta_etl_spark.operators.windows import cogroup_funnel

    t0 = dt.datetime(2024, 1, 1)
    clicks, purchases = [], []
    for u in range(200):
        # u%3==0: 2 clicks before + 1 after first purchase; purchase at +2h
        # u%3==1: clicks only (no purchase)
        # u%3==2: purchase only
        if u % 3 == 0:
            clicks += [(u, t0), (u, t0 + dt.timedelta(hours=1)),
                       (u, t0 + dt.timedelta(hours=3))]
            purchases += [(u, t0 + dt.timedelta(hours=2)),
                          (u, t0 + dt.timedelta(hours=4))]
        elif u % 3 == 1:
            clicks += [(u, t0 + dt.timedelta(minutes=u))]
        else:
            purchases += [(u, t0 + dt.timedelta(minutes=u))]
    c = spark.createDataFrame(clicks, "user_id long, ts timestamp_ntz")
    p = spark.createDataFrame(purchases, "user_id long, ts timestamp_ntz")
    out = {
        r.user_id: (r.clicks_before_purchase, r.has_purchase)
        for r in cogroup_funnel(c, p, "user_id", "ts").collect()
    }
    assert len(out) == 200
    for u in range(200):
        if u % 3 == 0:
            assert out[u] == (2, True)
        elif u % 3 == 1:
            assert out[u] == (0, False)
        else:
            assert out[u] == (0, True)
