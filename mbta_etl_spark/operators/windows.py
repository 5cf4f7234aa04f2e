"""Window-function operators: sessionization, running aggregates,
as-of/gap analysis — the event-stream analytics the reference's data
model implies but its SQLite surface never reaches (SURVEY §2.6: no
window functions in the reference).

Scale notes: every operator here shuffles once on the partition key
(user), then sorts within partitions — the canonical windowed shape.
Skewed users are the risk at 100 TB; AQE skew-split handles the shuffle,
and a per-user row cap (not needed here) handles pathological keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_tiebreak: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_minutes``. session_id is the
    running count of session starts within the user (1-based).

    Two window passes over one (user)-keyed shuffle: lag for the gap
    flag, running sum for the session id.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    # gap test via interval arithmetic, NOT epoch casts: timestamp+interval
    # is exact to the microsecond in both Spark and the DuckDB oracle,
    # where second-truncation semantics differ between engines
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
        1,
    ).otherwise(0)
    with_flags = df.withColumn("_new", is_new)
    session_id = F.sum("_new").over(
        Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_flags.withColumn("session_id", session_id.cast("long")).drop("_new")


def session_summary(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_tiebreak: str,
    value_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: event count, value sum, session start/end."""
    s = sessionize(df, user_col, ts_col, order_tiebreak, gap_minutes)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def running_totals(
    df: DataFrame, user_col: str, ts_col: str, order_tiebreak: str, value_col: str
) -> DataFrame:
    """Per-user running sum + previous value (lag) — one shuffle, one
    sort, two frame specs sharing the same window ordering."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    run = (
        F.sum(value_col)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return df.select(
        F.col("event_id"),
        F.col(user_col),
        F.col(value_col),
        F.round(run, 6).alias("running_value"),
        F.lag(value_col).over(w).alias("prev_value"),
    )


def cogroup_funnel(
    clicks: DataFrame, purchases: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Per-user funnel via CO-GROUPED applyInPandas: for every user in
    either stream, count clicks strictly before their first purchase.

    This is the cogroup tier of the Pandas-UDF taxonomy — two DataFrames
    grouped on the same key, each key's two frames handed to one Python
    function together. The right tool when per-key logic needs BOTH
    sides at once and isn't a plain join (alignment, interleaving,
    per-key model scoring against per-key history). Both sides shuffle
    once on the key — same cost as a join — and the Python kernel sees
    bounded per-key frames.

    Expressible in SQL with a min-aggregate + conditional join (the
    oracle does exactly that); the operator exists to pin the cogroup
    execution path, not because SQL can't say it.

    Grouping granularity (round-8 optimization, guide §4): cogrouped
    applyInPandas invokes the kernel once per KEY, each call paying an
    Arrow transfer + two pandas frame constructions — per-user keys
    made that overhead the whole bill (1,500 users at bench scale;
    measured ~3.9 s -> ~1 s by bucketing). The cogroup key is therefore
    a HASH BUCKET of the user (xxhash64 % 64, deterministic per guide
    §2.5) and the kernel computes the per-user funnel VECTORIZED over
    its bucket (groupby min / map / boolean sum — no per-user Python).
    Same cogroup execution path (FlatMapCoGroupsInPandas), same one
    shuffle per side, ~64 kernel calls instead of ~|users|."""
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("clicks_before_purchase", LongType()),
            StructField("has_purchase", BooleanType()),
        ]
    )

    def _funnel(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # first purchase per user in this bucket
        fp = (
            right.groupby(user_col)[ts_col].min()
            if len(right)
            else pd.Series(dtype="datetime64[us]")
        )
        users_l = left[user_col].unique() if len(left) else []
        users = pd.Index(users_l).union(pd.Index(fp.index))
        if len(left) and len(fp):
            mapped = left[user_col].map(fp)
            before = left.loc[left[ts_col] < mapped]  # NaT compares False
            counts = before.groupby(user_col).size()
        else:
            counts = pd.Series(dtype="int64")
        has = users.isin(fp.index)
        n = (
            pd.Series(users.map(counts), index=users)
            .fillna(0)
            .astype("int64")
            .where(pd.Series(has, index=users), 0)
        )
        return pd.DataFrame(
            {
                "user_id": pd.Series(users, dtype="int64"),
                "clicks_before_purchase": n.to_numpy(),
                "has_purchase": has,
            }
        )

    # bucket count: session shuffle sizing with a 64 floor (r9; same
    # derivation and rationale as timeseries.ewma's n_buckets)
    from mbta_etl_spark.operators.core import session_shuffle_partitions

    n_buckets = max(64, session_shuffle_partitions(clicks))
    bkt = F.pmod(F.xxhash64(user_col), F.lit(n_buckets)).alias("_bkt")
    return (
        clicks.select(bkt, user_col, ts_col)
        .groupBy("_bkt")
        .cogroup(purchases.select(bkt, user_col, ts_col).groupBy("_bkt"))
        .applyInPandas(_funnel, schema=out_schema)
    )
