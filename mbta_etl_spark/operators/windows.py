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
