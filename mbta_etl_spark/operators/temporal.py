"""Temporal joins: as-of join and keyed time-range join.

The reference engine has no temporal-join operator (its richest join
surface is the per-id point lookup, reference pipeline/queries.go:290-294);
these are the beyond-reference operators a training-data / event-analytics
pipeline needs (attribution, feature backfill, point-in-time correctness).

Spark-first design notes
------------------------
``asof_join`` is NOT a range cross-join. It is the union-tag + running
``last(ignorenulls)`` window construction: both streams are unioned,
shuffled ONCE on the join key, sorted by (ts, side), and each left row
picks up the most recent right payload via an unbounded-preceding window.
That is exactly the merge pass a hand-written as-of merge join would do,
expressed declaratively so Catalyst/Tungsten run it as one Exchange + one
Sort + one codegen'd Window — no row explosion, no per-row subquery, and
wall-clock scales like any keyed aggregation at 100 TB. Hot keys skew the
sort the same way they skew any window; mitigate upstream by splitting the
key space (e.g. salting with per-salt re-merge) if one key dominates.

``range_join_agg`` keeps an equi-key, so Catalyst plans a shuffled
hash/sort-merge join on the key with the range condition as a post-join
filter — the scalable shape. A pure range predicate with NO equi-key
would degrade to BroadcastNestedLoopJoin; don't do that at scale, bucket
the time axis instead (see sources/layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_PREFIX = "_r_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    largest ``ts`` <= left ``ts`` (direction="backward", inclusive) or the
    smallest ``ts`` >= left ``ts`` ("forward"), per ``on`` key.

    Right columns arrive prefixed ``r_`` (including ``r_<ts>``); left rows
    with no match keep nulls (LEFT semantics). Ties inside ``right`` at the
    same (key, ts) are resolved by the LAST payload row in (ts, side,
    payload-order) — dedupe ``right`` first if you need a specific winner.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    r = right.select(
        F.col(on),
        F.col(ts),
        F.col(ts).alias(f"{_PREFIX}{ts}"),
        *[F.col(c).alias(f"{_PREFIX}{c}") for c in payload],
        F.lit(0).alias(_SIDE),
    )
    l = left.withColumn(_SIDE, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    order = (
        [F.col(ts).asc(), F.col(_SIDE).asc()]
        if direction == "backward"
        else [F.col(ts).desc(), F.col(_SIDE).asc()]
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{_PREFIX}{ts}"] + [f"{_PREFIX}{c}" for c in payload]
    out = u
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.filter(F.col(_SIDE) == 1).drop(_SIDE)
    renames = {f"{_PREFIX}{ts}": f"r_{ts}"} | {
        f"{_PREFIX}{c}": f"r_{c}" for c in payload
    }
    return out.withColumnsRenamed(renames)


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_expr: str,
    aggs: list,
) -> DataFrame:
    """Keyed time-range join + aggregate: for each left row, aggregate the
    right rows of the same key whose ``right_ts`` falls in
    (left_ts - window, left_ts].

    ``window_expr`` is a SQL interval literal body, e.g. ``"INTERVAL 10
    MINUTES"``. ``aggs`` are aggregate Columns over the joined right side
    (nulls for unmatched lefts — use count/coalesce accordingly).
    Equi-key keeps the plan a shuffled join, not a nested loop.
    """
    lo = F.expr(f"l.{left_ts} - {window_expr}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") > lo)
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    joined = left.alias("l").join(right.alias("r"), cond, "left")
    group_cols = [F.col(f"l.{c}") for c in left.columns]
    return joined.groupBy(*group_cols).agg(*aggs)
