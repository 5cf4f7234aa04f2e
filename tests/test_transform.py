"""Transform-layer unit tests mirroring the reference's test strategy
(main_test.go, FIXTURES.md §A): nullable defaults, invalid-row filtering,
status normalization, timestamp fallback."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mbta_etl_spark.pipeline.schema import RAW_VEHICLE_SCHEMA
from mbta_etl_spark.pipeline.transform import transform

NOW = datetime.datetime(2024, 1, 15, 12, 0, 0)
VALID_TS = "2024-01-15T10:30:00-05:00"


def _raw(spark, rows):
    return spark.createDataFrame(rows, schema=RAW_VEHICLE_SCHEMA)


def _attrs(**over):
    base = {
        "updated_at": VALID_TS,
        "speed": 25.5,
        "revenue_status": "REVENUE",
        "occupancy_status": "MANY_SEATS_AVAILABLE",
        "longitude": -71.06,
        "latitude": 42.35,
        "label": "1234",
        "direction_id": 0,
        "current_stop_sequence": 5,
        "current_status": "IN_TRANSIT_TO",
        "bearing": 180,
    }
    base.update(over)
    return base


def _xform(spark, rows):
    return transform(_raw(spark, rows), now=F.lit(NOW)).collect()


def test_nullable_defaults(spark):
    """speed nil→0.0, bearing nil→0 (main_test.go:111-154)."""
    out = _xform(
        spark,
        [{"id": "test-1", "type": "vehicle", "attributes": _attrs(speed=None, bearing=None)}],
    )
    assert len(out) == 1
    assert out[0]["speed"] == 0.0
    assert out[0]["bearing"] == 0


def test_filters_invalid_records(spark):
    """Empty id / empty label dropped; survivor kept (main_test.go:157-210)."""
    out = _xform(
        spark,
        [
            {"id": "", "type": "vehicle", "attributes": _attrs()},
            {"id": "test-2", "type": "vehicle", "attributes": _attrs(label="")},
            {"id": "test-3", "type": "vehicle", "attributes": _attrs()},
            {"id": None, "type": "vehicle", "attributes": _attrs()},
        ],
    )
    assert [r["id"] for r in out] == ["test-3"]


def test_normalizes_status(spark):
    """''→'UNKNOWN' for both statuses; non-empty passthrough
    (main_test.go:213-247)."""
    out = _xform(
        spark,
        [
            {"id": "a", "type": "vehicle", "attributes": _attrs(current_status="", occupancy_status="")},
            {"id": "b", "type": "vehicle", "attributes": _attrs()},
        ],
    )
    by_id = {r["id"]: r for r in out}
    assert by_id["a"]["current_status"] == "UNKNOWN"
    assert by_id["a"]["occupancy_status"] == "UNKNOWN"
    assert by_id["b"]["current_status"] == "IN_TRANSIT_TO"
    assert by_id["b"]["occupancy_status"] == "MANY_SEATS_AVAILABLE"


def test_timestamp_parse_and_fallback(spark):
    """Valid RFC3339 parsed; malformed → batch now (transform.go:20-24)."""
    out = _xform(
        spark,
        [
            {"id": "good", "type": "vehicle", "attributes": _attrs()},
            {"id": "bad", "type": "vehicle", "attributes": _attrs(updated_at="not-a-time")},
        ],
    )
    by_id = {r["id"]: r for r in out}
    # 10:30 -05:00 == 15:30 UTC (session tz is UTC)
    assert by_id["good"]["updated_at"] == datetime.datetime(2024, 1, 15, 15, 30)
    assert by_id["bad"]["updated_at"] == NOW
    assert by_id["bad"]["ingested_at"] == NOW


def test_flatten_drops_unused_fields(spark):
    out_df = transform(
        _raw(spark, [{"id": "x", "type": "vehicle", "attributes": _attrs()}]),
        now=F.lit(NOW),
    )
    cols = set(out_df.columns)
    assert "type" not in cols
    assert "revenue_status" not in cols
    assert "current_stop_sequence" not in cols
    assert cols == {
        "id", "label", "latitude", "longitude", "speed", "direction_id",
        "current_status", "occupancy_status", "bearing", "updated_at", "ingested_at",
    }
