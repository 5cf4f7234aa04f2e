"""T1–T7 — the reference's Transform stage (pipeline/transform.go:9-59) as
one declarative DataFrame expression.

The reference loops over Go structs row-at-a-time; here every rule is a
Catalyst expression inside one whole-stage-codegen projection — a single
pass, no UDFs, no Python in the hot path, shuffle-free. This is the shape
that processes 100 TB of archived snapshots at full scan speed.

Semantics replicated exactly (SURVEY §2.2):
- T1 validity filter: drop rows with empty id or empty label
  (transform.go:15-17).
- T2 timestamp parse with fallback: RFC3339 parse; on failure use the
  batch ingest time, do NOT fail the row (transform.go:20-24).
- T3/T4 null defaults: speed nil→0.0, bearing nil→0
  (transform.go:27-35).
- T5 status normalization: empty string (not null!) → 'UNKNOWN' for both
  current_status and occupancy_status (transform.go:62-67).
- T6 flatten/project: nested attributes → flat 11 columns; drops type,
  revenue_status, current_stop_sequence (transform.go:41-53).
- T7 ingest-time column: ONE timestamp for the whole batch
  (transform.go:11) — current_timestamp() is likewise query-constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_status(col: Column) -> Column:
    """T5 (reference pipeline/transform.go:62-67): ''→'UNKNOWN'.
    Null is also mapped to UNKNOWN — the Go zero value for a missing JSON
    string is '', so absent fields hit the same branch."""
    return (
        F.when(col.isNull() | (col == ""), F.lit("UNKNOWN")).otherwise(col)
    )


def transform(raw: DataFrame, now: Column | None = None) -> DataFrame:
    """Raw nested vehicles → normalized flat records.

    ``now`` defaults to ``current_timestamp()`` (query-constant, matching
    the reference's single ``time.Now()`` per batch); tests inject a
    literal for determinism.
    """
    if now is None:
        now = F.current_timestamp()

    a = F.col("attributes")
    # null on parse failure (T2) — try_to_timestamp, because under ANSI
    # mode (Spark 4 default) plain to_timestamp would fail the whole batch
    # where the reference only falls back for the one row
    parsed = F.try_to_timestamp(a["updated_at"])

    return (
        raw
        # T1 — validity filter (transform.go:15-17)
        .filter(
            F.col("id").isNotNull()
            & (F.col("id") != "")
            & a["label"].isNotNull()
            & (a["label"] != "")
        )
        # T6 flatten + T2/T3/T4/T5/T7 rules as one projection
        .select(
            F.col("id"),
            a["label"].alias("label"),
            a["latitude"].alias("latitude"),
            a["longitude"].alias("longitude"),
            F.coalesce(a["speed"], F.lit(0.0)).alias("speed"),  # T3
            a["direction_id"].alias("direction_id"),
            normalize_status(a["current_status"]).alias("current_status"),  # T5
            normalize_status(a["occupancy_status"]).alias("occupancy_status"),  # T5
            F.coalesce(a["bearing"], F.lit(0)).alias("bearing"),  # T4
            F.coalesce(parsed, now).alias("updated_at"),  # T2 fallback
            now.alias("ingested_at"),  # T7
        )
    )
