"""Structured Streaming variants of the reference's ingest loop.

The reference is a one-shot batch re-run per CLI invocation, with the
UPSERT absorbing re-ingestion (SURVEY §2.6); here the same three stages
run continuously:

- **source**: a file-stream of JSON snapshots (the landing pattern for a
  polled HTTP API at scale — pollers write snapshots to object storage,
  the stream picks them up; ``maxFilesPerTrigger`` bounds micro-batch
  size).
- **transform**: the exact batch ``transform()`` — Structured Streaming
  reuses unmodified batch expressions.
- **sink**: ``foreachBatch`` → the same upsert merge, giving the
  reference's last-write-wins semantics per micro-batch; or a
  watermarked ``dropDuplicates`` for at-most-once per key within the
  lateness horizon.

Also here: the streaming analog of the hourly rollup (q15) — watermarked
tumbling-window aggregation, the canonical late-data-tolerant shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mbta_etl_spark.pipeline.load import upsert_parquet
from mbta_etl_spark.pipeline.schema import RAW_VEHICLE_SCHEMA
from mbta_etl_spark.pipeline.transform import transform


def stream_vehicle_snapshots(
    spark: SparkSession, snapshot_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream of JSONL vehicle snapshots with the declared raw
    schema (schema must be explicit for streaming reads)."""
    reader = spark.readStream.schema(RAW_VEHICLE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(snapshot_dir)


def run_upsert_stream(
    spark: SparkSession,
    snapshot_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuous ETL: stream snapshots → batch transform → per-micro-batch
    upsert merge. ``available_now=True`` drains what's there and stops
    (used by tests and backfills)."""
    records = transform(stream_vehicle_snapshots(spark, snapshot_dir))

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # within one micro-batch multiple snapshots may carry the same id;
        # pre-dedup so the merge sees one candidate per key
        upsert_parquet(batch_df.sparkSession, batch_df, table_path)

    writer = (
        records.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rollup (streaming analog of q15):
    late rows within ``watermark_delay`` still update their window; older
    state is evicted, which is what bounds memory on an unbounded stream.
    Works on any DataFrame with (ts, value) — batch or streaming."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window(F.col("ts"), window_duration).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("cnt"),
            F.col("sum_value"),
        )
    )


def dedup_stream_by_key(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: emit the FIRST arrival of each key, drop
    re-deliveries within the watermark horizon
    (``dropDuplicatesWithinWatermark``).

    This is the streaming arm of the dedup suite (batch arm:
    operators/dedup.exact_dedup_groups). State is one entry per key in
    the state store, partitioned by key like any keyed operator, and the
    watermark is what makes it 100 TB-safe: per-key state older than the
    horizon is evicted, so the store holds only the horizon's keys
    instead of growing without bound. The trade is at-least-once beyond
    the horizon — a key re-delivered later than ``watermark_delay`` is
    emitted again; size the horizon to the source's re-delivery window.
    """
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def sliding_window_rates(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Sliding-window rollup: each row lands in duration/slide overlapping
    windows (here 4), so the state store carries that factor — the cost
    of smooth rates vs tumbling windows. Emitted per window: count, mean.
    Works on any DataFrame with (ts, value) — batch or streaming."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window(F.col("ts"), window_duration, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col("cnt"),
            F.col("avg_value"),
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: right-side rows attach to a left-side
    row with the same key when they arrive within [left_ts, left_ts +
    max_delay] — the click-to-impression attribution shape, but live.

    Both sides are watermarked AND the join condition bounds event time
    in both directions; together these let the state store evict: a
    buffered left row can be dropped once the right watermark passes
    left_ts + max_delay (and vice versa), so state is proportional to
    the delay horizon, not the stream history. Without the time bound
    Spark would (correctly) refuse unbounded stream-stream state growth
    for outer joins and buffer forever for inner. Column names must be
    disjoint across the two streams (streaming joins have no alias
    scoping across micro-batches).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner")


def interval_overlap_streams(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    a_ts: str,
    b_ts: str,
    a_window: str = "5 minutes",
    b_window: str = "2 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INTERVAL-OVERLAP join — the symmetric sibling of
    ``interval_join_streams``: each a-row owns the window
    [a_ts, a_ts + a_window), each b-row [b_ts, b_ts + b_window), and a
    pair joins when the windows overlap, i.e.
    ``b_ts > a_ts - b_window AND b_ts < a_ts + a_window`` (strict: two
    windows that merely touch do not overlap). The predicate is written
    directly on the two WATERMARKED event-time columns so the engine
    derives eviction bounds for BOTH state stores: an a-row drops once
    the global watermark passes a_ts + a_window, a b-row once it passes
    b_ts + b_window — state proportional to the window horizon, never
    the stream history. This is the streaming twin of the batch
    ``operators/temporal.interval_overlap_join`` (bin-bucketed there;
    here the engine's state store plays the bins' role). Column names
    must be disjoint across the two streams.

    ``how`` extends the same predicate to outer variants ("left_outer",
    "right_outer", "full_outer"): the engine emits the matched rows
    eagerly and the NULL-padded unmatched rows only when the watermark
    passes the row's window end (it must be certain no partner can
    still arrive), so a bounded replay needs the final watermark pushed
    past the last real window on BOTH sides — e.g. a far-future
    sentinel row per stream — or the tail's unmatched rows never
    emit."""
    wa = a.withWatermark(a_ts, watermark)
    wb = b.withWatermark(b_ts, watermark)
    cond = (
        (F.col(a_key) == F.col(b_key))
        & (F.col(b_ts) > F.col(a_ts) - F.expr(f"INTERVAL {b_window}"))
        & (F.col(b_ts) < F.col(a_ts) + F.expr(f"INTERVAL {a_window}"))
    )
    return wa.join(wb, cond, how)


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: the static side is re-resolved per
    micro-batch (a dimension refresh is picked up without restarting the
    query) and joined stateless — no watermark, no state store. Spark
    broadcasts the static side when it's small; this is the streaming
    analog of the dimension joins in q17/q30."""
    return events.join(F.broadcast(dim), on, how)


def session_window_counts(
    events: DataFrame,
    key: str = "event_type",
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-key session windows with a merge gap: rows closer than ``gap``
    within a key fuse into one session whose bounds grow dynamically —
    the streaming twin of the batch q18a operator (identical expression;
    the watermark bounds state by closing sessions older than the delay,
    so open-session state ~ #keys with activity inside the horizon, not
    history). Streaming output mode must be append/update — sessions
    emit when the watermark passes their end."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(
            F.col(key), F.session_window(F.col("ts"), gap).alias("sess")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )
