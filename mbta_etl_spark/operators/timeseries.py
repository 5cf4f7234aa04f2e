"""Time-series gap handling: LOCF fill and per-key delta/rate — the
hypertable-style operators (TimescaleDB's locf/interpolate/delta family)
a metrics pipeline runs over irregular event streams.

Scale shape: everything here is one window per operator — a single
shuffle keyed by the series key, then an in-partition ordered pass.
Identical cost envelope to sessionization (operators/windows.py); skewed
keys are the usual risk and AQE's skew handling the usual answer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def locf(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    value_col: str,
    out_col: str = "value_filled",
) -> DataFrame:
    """Last-observation-carried-forward: null measurements take the most
    recent non-null value within their series; leading nulls (no prior
    observation) stay null. ``F.last(ignorenulls=True)`` over a running
    frame — the engine-native gap fill, no self-join."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col, F.last(F.col(value_col), ignorenulls=True).over(w)
    )


def delta_rate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_tiebreak: str,
    value_col: str,
) -> DataFrame:
    """Per-series difference and per-second rate against the previous
    observation (counter-style metrics): delta = value − lag(value),
    rate = delta / seconds-elapsed. First row of each series → nulls.
    Rounding uses the explicit scaled-floor formula (floor(x*1e6+0.5)/1e6)
    rather than engine round(): round() implementations disagree on
    midpoint-adjacent doubles across engines, and a freshly-divided rate
    lands on those boundaries at scale."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, order_tiebreak)
    staged = df.withColumn("_prev_v", F.lag(value_col).over(w)).withColumn(
        "_prev_t", F.lag(ts_col).over(w)
    )
    # exact fractional seconds via microsecond diff: timestampdiff is
    # timezone-free on TIMESTAMP_NTZ, and whole-SECOND granularity would
    # diverge from engines that count boundary crossings when timestamps
    # carry sub-second parts — micros/1e6 is unambiguous everywhere
    secs = F.expr(
        f"timestampdiff(MICROSECOND, _prev_t, {ts_col}) / CAST(1000000 AS DOUBLE)"
    )
    delta = F.col(value_col) - F.col("_prev_v")

    def _r6(c: Column) -> Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return staged.select(
        *key_cols,
        ts_col,
        order_tiebreak,
        value_col,
        _r6(delta).alias("delta"),
        _r6(F.when(secs > 0, delta / secs)).alias("rate_per_s"),
    )
