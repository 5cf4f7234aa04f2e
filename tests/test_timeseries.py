"""Edge-case pins for the time-series gap operators (operators/timeseries.py):
leading/trailing nulls, exact midpoint interpolation, first-row deltas, and
zero-variance z-score frames — the cases the registry's random data may not
isolate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbta_etl_spark.operators import timeseries

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _t(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def _series(spark, rows):
    return spark.createDataFrame(rows, schema=_SCHEMA)


def test_locf_fills_gaps_but_not_leading_nulls(spark):
    df = _series(
        spark,
        [
            ("a", _t(0), 0, None),
            ("a", _t(1), 1, 10.0),
            ("a", _t(2), 2, None),
            ("a", _t(3), 3, None),
            ("a", _t(4), 4, 20.0),
            ("b", _t(0), 0, 5.0),
        ],
    )
    out = timeseries.locf(df, ["k"], [F.col("ts"), F.col("seq")], "value")
    got = {(r.k, r.seq): r.value_filled for r in out.collect()}
    assert got[("a", 0)] is None  # no prior observation
    assert got[("a", 2)] == 10.0 and got[("a", 3)] == 10.0
    assert got[("a", 4)] == 20.0  # non-null passes through
    assert got[("b", 0)] == 5.0  # series isolation


def test_interpolate_midpoint_and_edges(spark):
    df = _series(
        spark,
        [
            ("a", _t(0), 0, None),  # leading null: no extrapolation
            ("a", _t(10), 1, 100.0),
            ("a", _t(15), 2, None),  # midpoint of 100→200
            ("a", _t(20), 3, 200.0),
            ("a", _t(30), 4, None),  # trailing null: no extrapolation
        ],
    )
    out = timeseries.interpolate(df, ["k"], "ts", "seq", "value")
    got = {r.seq: r.value_interp for r in out.collect()}
    assert got[0] is None and got[4] is None
    assert got[1] == 100.0 and got[3] == 200.0
    assert got[2] == 150.0


def test_interpolate_weights_by_elapsed_time(spark):
    # null at 1/4 of the gap → prev + 0.25·(next−prev)
    df = _series(
        spark,
        [
            ("a", _t(0), 0, 8.0),
            ("a", _t(5), 1, None),
            ("a", _t(20), 2, 28.0),
        ],
    )
    out = timeseries.interpolate(df, ["k"], "ts", "seq", "value")
    got = {r.seq: r.value_interp for r in out.collect()}
    assert got[1] == 13.0  # 8 + (28-8)·(5/20)


def test_bucket_gapfill_emits_empty_buckets_with_locf(spark):
    df = _series(
        spark,
        [
            ("a", datetime.datetime(2024, 1, 1, 0, 30), 0, 10.0),
            ("a", datetime.datetime(2024, 1, 1, 0, 45), 1, 2.0),
            # hours 1 and 2 empty
            ("a", datetime.datetime(2024, 1, 1, 3, 10), 2, 7.0),
        ],
    )
    out = timeseries.bucket_gapfill(df, ["k"], "ts", "value")
    rows = {r.bucket.hour: r for r in out.collect()}
    assert sorted(rows) == [0, 1, 2, 3]  # full spine, gaps included
    assert rows[0].n_events == 2 and rows[0].sum_value == 12.0
    assert rows[1].n_events == 0 and rows[1].sum_value is None
    assert rows[1].sum_filled == 12.0 and rows[2].sum_filled == 12.0
    assert rows[3].sum_value == 7.0 and rows[3].sum_filled == 7.0


def test_delta_rate_first_row_null_and_rate(spark):
    df = _series(
        spark,
        [
            ("a", _t(0), 0, 10.0),
            ("a", _t(4), 1, 30.0),
        ],
    )
    out = timeseries.delta_rate(df, ["k"], "ts", "seq", "value")
    got = {r.seq: (r.delta, r.rate_per_s) for r in out.collect()}
    assert got[0] == (None, None)
    assert got[1] == (20.0, 5.0)


def test_ewma_recursion_matches_closed_form(spark):
    df = _series(
        spark,
        [
            ("a", _t(0), 0, 10.0),
            ("a", _t(1), 1, 20.0),
            ("a", _t(2), 2, 20.0),
            ("b", _t(0), 0, 4.0),
        ],
    )
    out = timeseries.ewma(df, ["k"], "ts", "seq", "value", alpha=0.5)
    got = {(r.k, r.seq): r.ewma for r in out.collect()}
    assert got[("a", 0)] == 10.0  # s0 = v0
    assert got[("a", 1)] == 15.0  # 0.5·10 + 0.5·20
    assert got[("a", 2)] == 17.5
    assert got[("b", 0)] == 4.0  # series isolation


def test_ewma_series_isolation_within_shared_buckets(spark):
    """The bucketed grouped-map (round-8: 64 hash buckets instead of one
    group per series) must reset the recursion at EVERY series boundary
    inside a bucket. 200 keys >> 64 buckets forces multi-series buckets
    by pigeonhole, and each series' values are key-scaled so any state
    bleed across a boundary changes some output."""
    rows = []
    for k in range(200):
        rows.append((str(k), _t(0), 0, float(k)))
        rows.append((str(k), _t(1), 1, float(k) + 2.0))
    df = _series(spark, rows)
    out = timeseries.ewma(df, ["k"], "ts", "seq", "value", alpha=0.5)
    got = {(r.k, r.seq): r.ewma for r in out.collect()}
    assert len(got) == 400
    for k in range(200):
        assert got[(str(k), 0)] == float(k)  # s0 = v0, no bleed-in
        assert got[(str(k), 1)] == float(k) + 1.0  # 0.5·k + 0.5·(k+2)


def test_ewma_null_keys_chain_as_one_series(spark):
    """ADVICE r8: in the bucketed kernel a null key arrives as NaN and
    NaN != NaN is True, which would have restarted the series on every
    null-key row. Null-key rows must fold as ONE series — the original
    per-key groupBy semantics (all nulls are one group)."""
    rows = [
        (None, _t(0), 0, 8.0),
        (None, _t(1), 1, 16.0),
        ("a", _t(0), 0, 4.0),
    ]
    df = _series(spark, rows)
    out = timeseries.ewma(df, ["k"], "ts", "seq", "value", alpha=0.5)
    got = {(r.k, r.seq): r.ewma for r in out.collect()}
    assert got[(None, 0)] == 8.0  # s0 = v0
    assert got[(None, 1)] == 12.0  # 0.5·8 + 0.5·16 — CHAINED, not reset
    assert got[("a", 0)] == 4.0


def test_salted_join_identical_to_plain_join(spark):
    from mbta_etl_spark.operators.skew import salted_join

    fact = spark.range(100).select(
        F.col("id").alias("rid"), (F.col("id") % 3).alias("k")
    )
    dim = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    salted = salted_join(fact, dim, "k", 4, F.col("rid")).orderBy("rid")
    plain = fact.join(dim, "k").orderBy("rid")
    assert [tuple(r) for r in salted.select("rid", "k", "payload").collect()] \
        == [tuple(r) for r in plain.select("rid", "k", "payload").collect()]


def test_rolling_zscore_constant_series_no_anomaly(spark):
    rows = [("a", _t(i), i, 7.0) for i in range(10)]
    df = _series(spark, rows)
    out = timeseries.rolling_zscore(df, ["k"], "ts", "seq", "value")
    for r in out.collect():
        assert r.z is None  # zero variance → undefined z
        assert r.is_anomaly is False


def test_rolling_zscore_flags_spike(spark):
    rows = [("a", _t(i), i, 10.0 + (i % 2) * 0.5) for i in range(20)]
    rows.append(("a", _t(20), 20, 500.0))
    df = _series(spark, rows)
    out = timeseries.rolling_zscore(df, ["k"], "ts", "seq", "value")
    flags = {r.seq: r.is_anomaly for r in out.collect()}
    assert flags[20] is True
    assert not any(flags[i] for i in range(20))


def test_salted_left_join_preserves_unmatched_rows(spark):
    """The outer-join hazard the docstring warns about: a deterministic
    salt must leave unmatched fact rows appearing EXACTLY once with null
    payload (a nondeterministic salt could duplicate or drop them under
    task retries; here we pin the single-attempt contract)."""
    from mbta_etl_spark.operators.skew import salted_join

    fact = spark.range(10).select(
        F.col("id").alias("rid"), (F.col("id") % 5).alias("k")
    )
    dim = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    out = salted_join(fact, dim, "k", 4, F.col("rid"), how="left").collect()
    assert len(out) == 10  # every fact row exactly once
    unmatched = [r for r in out if r["payload"] is None]
    assert sorted(r["k"] for r in unmatched) == [3, 3, 4, 4]


def test_bucket_gapfill_span_guard_keeps_last_n(spark):
    """max_buckets_per_key truncates a sparse key's spine to its most
    recent N buckets — the guard against spine blowup from long-lived
    sparse keys."""
    df = _series(
        spark,
        [
            ("a", datetime.datetime(2024, 1, 1, 0, 10), 0, 1.0),
            ("a", datetime.datetime(2024, 1, 1, 23, 10), 1, 2.0),
        ],
    )
    full = timeseries.bucket_gapfill(df, ["k"], "ts", "value")
    assert full.count() == 24  # whole-day spine
    capped = timeseries.bucket_gapfill(
        df, ["k"], "ts", "value", max_buckets_per_key=4
    )
    rows = sorted(r.bucket.hour for r in capped.collect())
    assert rows == [20, 21, 22, 23]  # last 4 buckets only


def test_minmax_normalize_constant_series_null(spark):
    df = _series(
        spark,
        [
            ("a", _t(0), 0, 10.0),
            ("a", _t(1), 1, 30.0),
            ("a", _t(2), 2, 20.0),
            ("b", _t(0), 0, 7.0),
            ("b", _t(1), 1, 7.0),  # constant series
        ],
    )
    out = {
        (r.k, r.seq): r.value_norm
        for r in timeseries.minmax_normalize(df, ["k"], "value").collect()
    }
    assert out[("a", 0)] == 0.0 and out[("a", 1)] == 1.0
    assert out[("a", 2)] == 0.5
    assert out[("b", 0)] is None and out[("b", 1)] is None


def test_locf_ttl_expires_stale_values(spark):
    df = _series(
        spark,
        [
            ("a", datetime.datetime(2024, 1, 1, 0, 0), 0, 5.0),
            ("a", datetime.datetime(2024, 1, 1, 0, 30), 1, None),  # fresh
            ("a", datetime.datetime(2024, 1, 1, 3, 0), 2, None),   # stale
        ],
    )
    out = timeseries.locf_with_ttl(
        df, ["k"], "ts", "seq", "value", max_stale_seconds=3600.0
    )
    got = {r.seq: r.value_filled for r in out.collect()}
    assert got[0] == 5.0  # own observation, age 0
    assert got[1] == 5.0  # 30 min old: carried
    assert got[2] is None  # 3 h old: expired


def test_subseq_topk_finds_scaled_shifted_copy(spark):
    """Z-normalization makes the search shape-only: a copy of the
    opening pattern that is scaled 5x and shifted +100 must be the top
    match with ~zero distance."""
    from pyspark.sql import functions as F

    from mbta_etl_spark.operators.timeseries import subseq_topk

    pattern = [1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0, 9.0]
    noise = [50.0, 10.0, 40.0, 20.0, 30.0, 25.0, 45.0, 15.0, 35.0, 22.0]
    planted = [100 + 5 * x for x in pattern]  # same shape, new level/scale
    series = pattern + noise + planted + noise[::-1]
    rows = [(i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "bucket long, v double")
    out = subseq_topk(df, "bucket", "v", w=8, k=3).collect()
    # planted copy starts at index len(pattern)+len(noise) = 18
    assert out[0]["bucket"] == 18
    assert out[0]["dist"] < 1e-5
    assert out[1]["dist"] > out[0]["dist"]


def test_seasonal_mad_flags_injected_break_not_weekly_shape(spark):
    """A strong weekly shape alone yields no anomalies (the profile
    absorbs it); one injected level break on a single day is flagged,
    and every emitted score clears the threshold."""
    import datetime as dt

    from mbta_etl_spark.operators.timeseries import seasonal_mad_anomalies

    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(56):
        day = base + dt.timedelta(days=d)
        val = 100.0 + 20.0 * (d % 7) + (d % 5) * 0.5  # weekly shape + jitter
        if d == 40:
            val += 500.0  # the break
        rows.append(("m", day, val))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz, value double")
    out = seasonal_mad_anomalies(df, ["event_type"], "ts", "value", threshold=3.0).collect()
    assert [r["bucket"] for r in out] == [base + dt.timedelta(days=40)]
    for r in out:
        assert abs(r["score"]) > 3.0
        assert 0 <= r["dow"] <= 6


def test_changepoint_finds_injected_level_shift(spark):
    """A clean level shift is located exactly; the reduction is nearly
    the whole SSE and the two means recover the segment levels."""
    import datetime as dt

    from mbta_etl_spark.operators.timeseries import changepoint_single

    base = dt.datetime(2024, 3, 1)
    rows = []
    for d in range(30):
        lvl = 10.0 if d < 18 else 50.0
        rows.append(("s", base + dt.timedelta(days=d), lvl + (d % 3) * 0.01))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz, value double")
    out = changepoint_single(df, ["event_type"], "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r["split_bucket"] == base + dt.timedelta(days=17)  # last pre-shift day
    assert r["t"] == 18 and r["n"] == 30
    assert abs(r["left_mean"] - 10.01) < 0.01
    assert abs(r["right_mean"] - 50.01) < 0.01
    assert r["sse_reduction"] > 0.99 * r["sse_total"]


def test_acf_alternating_series_signs(spark):
    """A perfect period-2 series: ACF(1) = -1, ACF(2) = +1; lag longer
    than the series yields no row."""
    import datetime as dt

    from mbta_etl_spark.operators.timeseries import acf

    base = dt.datetime(2024, 5, 1)
    rows = [
        ("s", base + dt.timedelta(days=d), 10.0 if d % 2 == 0 else 20.0)
        for d in range(20)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz, value double")
    out = {r["lag"]: r for r in acf(df, ["event_type"], "ts", "value", (1, 2, 30)).collect()}
    assert out[1]["acf"] == -1.0
    assert out[2]["acf"] == 1.0
    assert 30 not in out
    assert out[1]["n_pairs"] == 19 and out[2]["n_pairs"] == 18


def test_stl_decompose_recovers_planted_weekly_cycle(spark):
    """Trend-free series with a pure weekly cycle: trend ~= overall
    level, seasonal recovers the per-weekday offsets, residual ~= 0;
    edge rows without a full centered window are dropped."""
    import datetime as dt

    from mbta_etl_spark.operators.timeseries import stl_decompose

    base = dt.datetime(2024, 1, 1)  # a Monday
    offsets = [3.0, -1.0, 0.0, 2.0, -2.0, 1.0, -3.0]  # Mon..Sun, sums to 0
    rows = [
        ("s", base + dt.timedelta(days=d), 100.0 + offsets[d % 7])
        for d in range(28)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double"
    )
    out = stl_decompose(df, ["event_type"], "ts", "value").collect()
    # 28 days minus 3 head + 3 tail edge rows
    assert len(out) == 22
    for r in out:
        assert abs(r["trend"] - 100.0) < 1e-9  # every 7-window sums the cycle
        assert abs(r["seasonal"] - offsets[r["dow"] - 1]) < 1e-6
        assert abs(r["resid"]) < 1e-6
        assert abs(r["x"] - (100.0 + offsets[r["dow"] - 1])) < 1e-9


def test_forecast_backtest_perfect_weekly_cycle(spark):
    """A pure period-7 series: seasonal-naive is a perfect forecast
    (mae_seasonal = 0, mase = 0) while naive has the cycle's mean step
    error; a trending series with no weekly structure has mase > 1."""
    import datetime as dt

    from mbta_etl_spark.operators.timeseries import forecast_backtest

    base = dt.datetime(2024, 1, 1)
    offsets = [3.0, -1.0, 0.0, 2.0, -2.0, 1.0, -3.0]
    rows = [
        ("cyc", base + dt.timedelta(days=d), 100.0 + offsets[d % 7])
        for d in range(28)
    ] + [
        # strictly increasing: x_{t-1} beats x_{t-7} (error 1 vs 7)
        ("trend", base + dt.timedelta(days=d), float(d))
        for d in range(28)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double"
    )
    out = {
        r["event_type"]: r
        for r in forecast_backtest(df, ["event_type"], "ts", "value").collect()
    }
    assert out["cyc"].n_eval == 21
    assert out["cyc"].mae_seasonal == 0.0 and out["cyc"].mase == 0.0
    assert out["cyc"].mae_naive > 1.0
    assert out["trend"].mae_naive == 1.0 and out["trend"].mae_seasonal == 7.0
    assert abs(out["trend"].mase - 7.0) < 1e-6


def test_seasonality_strength_separates_cyclic_from_noise(spark):
    """A pure weekly cycle scores seasonal_strength ~1; white-ish noise
    with no weekly structure scores near 0; both stay in [0, 1]."""
    import datetime as dt

    from mbta_etl_spark.operators.timeseries import (
        seasonality_strength,
        stl_decompose,
    )

    base = dt.datetime(2024, 1, 1)
    offsets = [30.0, -10.0, 0.0, 20.0, -20.0, 10.0, -30.0]
    rows = [
        ("cyc", base + dt.timedelta(days=d), 100.0 + offsets[d % 7])
        for d in range(28)
    ] + [
        # deterministic aperiodic wiggle (period 11 vs season 7)
        ("noise", base + dt.timedelta(days=d), 100.0 + ((d * d) % 11) - 5.0)
        for d in range(28)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, value double"
    )
    stl = stl_decompose(df, ["event_type"], "ts", "value")
    out = {
        r["event_type"]: r
        for r in seasonality_strength(stl, ["event_type"]).collect()
    }
    for r in out.values():
        assert 0.0 <= r.seasonal_strength <= 1.0
        # NULL when Var(x - seasonal) == 0 (e.g. a pure cycle: trend +
        # resid is constant, so trend strength is undefined)
        if r.trend_strength is not None:
            assert 0.0 <= r.trend_strength <= 1.0
    assert out["cyc"].seasonal_strength > 0.99
    assert out["noise"].seasonal_strength < out["cyc"].seasonal_strength - 0.2


def test_ts33_residual_anomaly_invariants(spark):
    """Anomaly count bounded by buckets, MAD non-negative and bounded
    by the max deviation, and zero anomalies whenever nothing exceeds
    the 3-MAD threshold."""
    from mbta_etl_spark.plans.registry import ts33_stl_anomaly
    from tests.conftest import SF_DIR_SMALL

    rows = ts33_stl_anomaly(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_anomalies <= r.n_buckets
        assert r.resid_mad >= 0.0
        assert r.max_dev >= r.resid_mad  # max deviation bounds the MAD
        # anomalies require deviation beyond 3 MADs, so if MAD > 0 and
        # nothing exceeds it, the count must be zero
        if r.max_dev <= 3 * r.resid_mad:
            assert r.n_anomalies == 0


def test_burstiness_bounds_and_gap_consistency(spark):
    """B stays in [-1, 1] (it is (σ−μ)/(σ+μ) with σ, μ ≥ 0), CV is
    non-negative, and every stream with ≥2 events yields gaps."""
    from mbta_etl_spark.plans.registry import ts34_burstiness
    from tests.conftest import SF_DIR_SMALL

    rows = {r.event_type: r for r in ts34_burstiness(spark, SF_DIR_SMALL).collect()}
    for r in rows.values():
        assert r.n_gaps > 0 and r.mean_gap_s >= 0
        if r.cv is not None:
            assert r.cv >= 0
        if r.burstiness is not None:
            assert -1.0 <= r.burstiness <= 1.0


def test_theil_sen_matches_ols_on_clean_trend_and_pair_count(spark):
    from mbta_etl_spark.plans.registry import ts35_theil_sen
    from tests.conftest import SF_DIR_SMALL

    rows = ts35_theil_sen(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        # all C(n,2) pairs participate
        assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
        # both estimators see the same near-stationary daily series:
        # they must land in the same small neighborhood
        assert r.ols_slope is not None
        assert abs(r.ts_slope - r.ols_slope) < 5.0


def test_timedecay_smooth_constant_series_and_gap_awareness(spark):
    """A constant series smooths to itself exactly (weights cancel); on
    a two-point series the smoothed value leans toward the CURRENT
    point more when the gap is larger — the property ts06's row-count
    EWMA cannot express."""
    base = datetime.datetime(2024, 1, 1)

    def ev(eid, sec, val, uid=1):
        return (eid, uid, base + datetime.timedelta(seconds=sec), float(val))

    schema = "event_id long, user_id long, ts timestamp_ntz, value double"
    const = spark.createDataFrame(
        [ev(i, 60 * i, 7.5) for i in range(5)], schema
    )
    out = timeseries.timedecay_smooth(
        const, ["user_id"], "ts", "event_id", "value"
    ).collect()
    assert all(r.smoothed == 7.5 for r in out)
    assert [r.n_window for r in sorted(out, key=lambda r: r.event_id)] == [
        1, 2, 3, 4, 5,
    ]

    # same two values, small vs large gap: with a 1s gap the old point
    # keeps ~half weight (smoothed near the midpoint of 0 and 10); with
    # a 2h gap its weight decays to ~1/13 (smoothed well above 9)
    small_gap = spark.createDataFrame([ev(0, 0, 0.0), ev(1, 1, 10.0)], schema)
    large_gap = spark.createDataFrame(
        [ev(0, 0, 0.0), ev(1, 7200, 10.0)], schema
    )
    s = {r.event_id: r.smoothed for r in timeseries.timedecay_smooth(
        small_gap, ["user_id"], "ts", "event_id", "value").collect()}
    g = {r.event_id: r.smoothed for r in timeseries.timedecay_smooth(
        large_gap, ["user_id"], "ts", "event_id", "value").collect()}
    assert 4.9 < s[1] < 5.1
    assert g[1] > 9.0
    assert g[1] > s[1]


def test_m4_downsample_extremes_and_tie_rules(spark):
    """The four M4 points are the real extremes; value ties resolve
    min/first to the earliest point and max/last to the latest."""
    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # one hour bucket, crafted: duplicate max value at 10:05 and 10:20
        (1, base + datetime.timedelta(minutes=1), 5.0),
        (2, base + datetime.timedelta(minutes=5), 9.0),
        (3, base + datetime.timedelta(minutes=10), 1.0),
        (4, base + datetime.timedelta(minutes=20), 9.0),
        (5, base + datetime.timedelta(minutes=30), 4.0),
    ]
    df = spark.createDataFrame(
        [(f"t", i, ts, v) for i, ts, v in rows],
        "event_type string, event_id long, ts timestamp_ntz, value double",
    )
    out = timeseries.m4_downsample(
        df, ["event_type"], "ts", "event_id", "value"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_points == 5
    assert r.first_v == 5.0 and r.first_ts.minute == 1
    assert r.last_v == 4.0 and r.last_ts.minute == 30
    assert r.min_v == 1.0 and r.min_ts.minute == 10
    assert r.max_v == 9.0 and r.max_ts.minute == 20  # tie -> latest


def test_rolling_median_odd_even_frames_and_robustness(spark):
    """Median formula pins: leading frames (sizes 1..k+1) use the exact
    middle / two-middle-mean rule, and one spike leaves the median
    untouched while it would move a mean."""
    rows = [
        ("a", _t(i), i, v)
        for i, v in enumerate([1.0, 3.0, 2.0, 1000.0, 4.0, 5.0, 6.0, 7.0])
    ]
    out = {
        r.seq: (r.n_win, r.rolling_median)
        for r in timeseries.rolling_median(
            _series(spark, rows), ["k"], "ts", "seq", "value", lookback=6
        ).collect()
    }
    assert out[0] == (1, 1.0)
    assert out[1] == (2, 2.0)        # even: (1+3)/2
    assert out[2] == (3, 2.0)        # odd: middle of {1,2,3}
    assert out[3] == (4, 2.5)        # spike enters: (2+3)/2, not ~250
    assert out[4] == (5, 3.0)        # {1,3,2,1000,4} -> 3
    assert out[6] == (7, 4.0)        # full frame, spike still just 1 vote
    assert out[7] == (7, 5.0)        # window slid past value 1


def test_compress_consecutive_runs_and_reconstruction(spark):
    """Run starts, lengths, and totals: run_len sums to the row count,
    one row per state transition, LOCF reconstruction is implied by
    (start, run_len)."""
    vals = [10.0, 11.0, 12.0, 55.0, 56.0, 10.0, 10.0, 90.0]
    rows = [("a", _t(i), i, v) for i, v in enumerate(vals)]
    out = timeseries.compress_consecutive(
        _series(spark, rows),
        ["k"],
        "ts",
        "seq",
        F.floor(F.col("value") / F.lit(20.0)).cast("long"),
        state_name="band",
    ).orderBy("ts").collect()
    assert [(r.band, r.run_len, r.seq) for r in out] == [
        (0, 3, 0),   # 10,11,12 -> band 0
        (2, 2, 3),   # 55,56 -> band 2
        (0, 2, 5),   # back to band 0 — a NEW run, not merged with run 1
        (4, 1, 7),
    ]
    assert sum(r.run_len for r in out) == len(vals)


def test_compress_consecutive_single_exchange(spark):
    """The lag, run-id window and per-run aggregate all share the series
    key partitioning — exactly ONE Exchange in the physical plan."""
    rows = [("a", _t(i), i, float(i)) for i in range(10)]
    df = timeseries.compress_consecutive(
        _series(spark, rows),
        ["k"],
        "ts",
        "seq",
        F.floor(F.col("value") / F.lit(20.0)).cast("long"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1
