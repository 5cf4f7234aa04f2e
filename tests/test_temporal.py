"""As-of join and keyed range join semantics on hand-built frames."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from mbta_etl_spark.operators.temporal import asof_join, range_join_agg


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


LEFT_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("lid", LongType()),
    ]
)
RIGHT_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("rid", LongType()),
        StructField("v", DoubleType()),
    ]
)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T10:05:00"), 101),
            (1, _ts("2024-01-01T09:00:00"), 102),  # before any right row
            (2, _ts("2024-01-01T10:00:00"), 200),  # key with no right rows
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 1, 1.0),
            (1, _ts("2024-01-01T10:00:00"), 2, 2.0),  # equal-ts: inclusive
            (1, _ts("2024-01-01T10:04:00"), 3, 3.0),
        ],
        RIGHT_SCHEMA,
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", payload=["rid", "v"])
    got = {r["lid"]: (r["r_rid"], r["r_v"]) for r in out.collect()}
    assert got == {
        100: (2, 2.0),  # equal ts matches (inclusive)
        101: (3, 3.0),  # latest prior
        102: (None, None),  # left row earlier than all right rows
        200: (None, None),  # no right rows for key
    }
    assert out.count() == left.count()  # LEFT semantics: no row explosion


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", ts="ts", payload=["rid"], direction="forward"
    )
    got = {r["lid"]: r["r_rid"] for r in out.collect()}
    assert got == {100: 2, 101: None, 102: 1, 200: None}


def test_asof_carries_right_ts(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", payload=["rid"])
    row = {r["lid"]: r for r in out.collect()}[101]
    assert row["r_ts"] == _ts("2024-01-01T10:04:00")


def test_range_join_agg(spark):
    left, right = _frames(spark)
    out = range_join_agg(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="ts",
        window_expr="INTERVAL 10 MINUTES",
        aggs=[
            F.count(F.col("r.rid")).alias("n"),
            F.coalesce(F.sum(F.col("r.v")), F.lit(0.0)).alias("sv"),
        ],
    )
    got = {r["lid"]: (r["n"], r["sv"]) for r in out.collect()}
    assert got == {
        100: (1, 2.0),  # only the equal-ts 10:00 row in (09:50, 10:00]
        101: (2, 5.0),  # 10:00 and 10:04 in (09:55, 10:05]
        102: (0, 0.0),
        200: (0, 0.0),
    }


def test_asof_single_shuffle_plan(spark):
    """The as-of plan must contain exactly one Exchange (the key shuffle) —
    the merge-join shape that scales; a nested-loop or per-row join would
    show more."""
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", payload=["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # createDataFrame parallelizes locally: exchanges come only from the window
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_overlap_join_bins_and_boundaries(spark):
    """Pairs overlapping ACROSS a bin boundary must appear exactly once
    (multi-bin candidates dedup); same-bin non-overlaps must not."""
    import datetime

    from pyspark.sql import functions as F

    from mbta_etl_spark.operators.temporal import interval_overlap_join

    def t(minute, second=0):
        return datetime.datetime(2024, 1, 1, 0, minute, second)

    a = spark.createDataFrame(
        [
            ("u", 1, t(3), t(8)),    # spans bins 0 and 1 (5-min bins)
            ("u", 2, t(20), t(21)),  # no partner
        ],
        "user_id string, id long, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    b = spark.createDataFrame(
        [
            ("u", 10, t(4), t(6)),   # overlaps id=1 in both bins -> one row
            ("u", 11, t(8), t(9)),   # touches id=1's end: NOT an overlap
            ("u", 12, t(22), t(23)), # same bin as id=2, disjoint
        ],
        "user_id string, id long, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    rows = interval_overlap_join(a, b, "user_id").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a_id"], r["b_id"], r["overlap_s"]) == (1, 10, 120.0)


def test_j14_interval_coalesce_island_invariants(spark):
    """Island count is bounded by raw intervals, covered time sits
    between one hold window per island and the raw interval mass, and
    the merge ratio stays in [0, 1)."""
    from mbta_etl_spark.plans.registry import j14_interval_coalesce
    from tests.conftest import SF_DIR_SMALL

    rows = j14_interval_coalesce(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_islands <= r.n_intervals
        # every island covers at least one full hold window
        assert r.covered_us >= r.n_islands * 300 * 1_000_000
        # covered time can never exceed raw interval mass
        assert r.covered_us <= r.n_intervals * 300 * 1_000_000
        assert 0.0 <= r.merge_ratio < 1.0


def test_j15_forward_asof_is_next_at_or_after(spark):
    from mbta_etl_spark.plans.registry import j15_asof_forward
    from tests.conftest import SF_DIR_SMALL

    rows = j15_asof_forward(spark, SF_DIR_SMALL).collect()
    assert rows
    matched = [r for r in rows if r.purchase_ts is not None]
    assert matched, "some clicks must convert"
    for r in matched:
        assert r.purchase_ts >= r.ts  # forward: at-or-after
        assert r.secs_to_convert >= 0
    # unmatched clicks have null lag too
    for r in rows:
        if r.purchase_ts is None:
            assert r.secs_to_convert is None and r.purchase_id is None


def test_orphan_conversions_negative_asof_semantics(spark):
    """A purchase with a view 30 min before is NOT orphaned; one with a
    view 2 h before IS (gap reported); one with no view at all IS
    (gap NULL)."""
    import datetime

    from mbta_etl_spark.plans.registry import (
        J16_HORIZON_S,
        j16_orphan_conversions,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def row(eid, uid, etype, mins):
        return (
            eid,
            base + datetime.timedelta(minutes=mins),
            uid,
            etype,
            1.0,
            "{}",
        )

    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    rows = [
        row(1, 1, "view", -30), row(2, 1, "purchase", 0),    # covered
        row(3, 2, "view", -120), row(4, 2, "purchase", 0),   # stale view
        row(5, 3, "purchase", 0),                             # never viewed
    ]
    df = spark.createDataFrame(rows, schema)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.event_id: r for r in j16_orphan_conversions(spark, d).collect()}
    assert 2 not in out                      # fresh view: not orphan
    assert out[4].gap_s == 7200 and out[4].gap_s > J16_HORIZON_S
    assert out[5].gap_s is None


def test_window_funnel_depths(spark):
    """Crafted users hit each depth: full chain within windows → 3;
    click in time but purchase too late → 2; click too late → 1."""
    import datetime
    import tempfile

    from mbta_etl_spark.plans.registry import j17_window_funnel

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def row(eid, uid, etype, mins):
        return (eid, base + datetime.timedelta(minutes=mins), uid, etype,
                1.0, "{}")

    schema = ("event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double, props string")
    rows = [
        # user 1: view -> click(+10m) -> purchase(+20m): depth 3
        row(1, 1, "view", 0), row(2, 1, "click", 10), row(3, 1, "purchase", 30),
        # user 2: click in time, purchase 2h after click: depth 2
        row(4, 2, "view", 0), row(5, 2, "click", 10), row(6, 2, "purchase", 150),
        # user 3: click 2h after view: depth 1
        row(7, 3, "view", 0), row(8, 3, "click", 120),
        # user 4: view only: depth 1
        row(9, 4, "view", 0),
    ]
    df = spark.createDataFrame(rows, schema)
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.user_id: r.funnel_depth
               for r in j17_window_funnel(spark, d).collect()}
    assert out == {1: 3, 2: 2, 3: 1, 4: 1}


def test_markov_attribution_hand_chain(spark):
    """On a hand-built two-channel chain the removal effects follow the
    path structure: removing the only channel on the converting path
    kills all conversion."""
    import datetime
    import tempfile

    from mbta_etl_spark.plans.registry import j18_markov_attribution

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def row(eid, uid, etype, mins):
        return (eid, base + datetime.timedelta(minutes=mins), uid, etype,
                1.0, "{}")

    schema = ("event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double, props string")
    rows = []
    eid = 0
    # 10 users: view -> purchase (all conversion flows through 'view')
    for u in range(10):
        rows += [row(eid, u, "view", 0), row(eid + 1, u, "purchase", 5)]
        eid += 2
    # 5 users: click -> (end, no purchase)
    for u in range(10, 15):
        rows += [row(eid, u, "click", 0)]
        eid += 1
    df = spark.createDataFrame(rows, schema)
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.channel: r for r in
               j18_markov_attribution(spark, d).collect()}
    assert out["view"].removal_effect > 0
    assert out["view"].attribution_share == 1.0
    assert out["click"].removal_effect == 0.0
    assert out["view"].conv_p > 0.6  # 10/15 journeys convert
