"""Streaming continuous aggregate: the incremental rollup (operators/
rollup.py) driven by Structured Streaming — each micro-batch partial-
aggregates its own events and merges into the standing rollup table via
the same atomic publish the upsert sink uses.

This is the foreachBatch form of a materialized view: state lives in the
TABLE (mergeable partials), not the stream engine, so the aggregate
survives restarts for free (checkpoint replays unmerged batches; merging
a batch is idempotent against re-aggregation of the same rows only if
each batch is merged exactly once — which the streaming checkpoint
guarantees for foreachBatch with deterministic batch ids).

Scale: per micro-batch cost is one partial aggregation of the batch plus
a merge shuffle over partial ROWS (bucket × key cardinality), never the
accumulated raw events. Late data merges into whichever old bucket it
belongs to — no watermark cutoff; add one if the rollup table's bucket
range must stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbta_etl_spark.operators.rollup import rollup_increment, rollup_merge
from mbta_etl_spark.pipeline.load import atomic_publish


def start_rollup_stream(
    events: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str] | None = None,
    bucket: str = "hour",
):
    """events stream (ts, value, *keys) → continuously-merged rollup
    table at ``table_path``. Returns the StreamingQuery."""
    keys = keys or ["event_type"]

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        inc = rollup_increment(
            batch_df, F.col("ts"), F.col("value"), keys, bucket
        )
        spark = batch_df.sparkSession
        import os

        if os.path.exists(table_path):
            existing = spark.read.parquet(table_path)
            merged = rollup_merge(existing, inc)
        else:
            merged = inc
        atomic_publish(merged, table_path)

    return (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
