"""Extract / load / vehicle-query tests mirroring the reference's suite
(main_test.go): extract error semantics, upsert last-write-wins, top-10,
summary stats, route CASE dead arm, bearing histogram edges."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from mbta_etl_spark.operators import core
from mbta_etl_spark.pipeline import vehicle_queries as vq
from mbta_etl_spark.pipeline.load import upsert_parquet
from mbta_etl_spark.pipeline.schema import VEHICLE_SCHEMA
from mbta_etl_spark.sources import http_json

NOW = datetime.datetime(2024, 1, 15, 12, 0, 0)


def _vehicle(i, speed=0.0, bearing=0, vid=None, status="IN_TRANSIT_TO",
             occ="MANY_SEATS_AVAILABLE", direction=0, ingested=NOW):
    return (
        vid or f"veh-{i}", f"label-{i}", 42.0, -71.0, float(speed), direction,
        status, occ, int(bearing), NOW, ingested,
    )


def _vehicles_df(spark, rows):
    return spark.createDataFrame(rows, schema=VEHICLE_SCHEMA)


# --- extract (S1) ---------------------------------------------------------

def test_extract_success(spark):
    """Canonical 1-vehicle payload decodes (main_test.go:18-69)."""
    body = json.dumps({
        "data": [{
            "id": "test-vehicle-1", "type": "vehicle",
            "attributes": {
                "updated_at": "2024-01-15T10:30:00-05:00", "speed": 25.5,
                "occupancy_status": "MANY_SEATS_AVAILABLE", "longitude": -71.06,
                "latitude": 42.35, "label": "1234", "direction_id": 0,
                "current_status": "IN_TRANSIT_TO", "bearing": 180,
            },
        }]
    })
    df = http_json.ingest_payload(spark, body)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "test-vehicle-1"
    assert rows[0]["attributes"]["label"] == "1234"
    # unknown fields would be dropped by the schema; nullable missing ok


def test_extract_invalid_json(spark):
    with pytest.raises(http_json.ExtractError):
        http_json.ingest_payload(spark, "{not json")


def test_extract_missing_data_array(spark):
    with pytest.raises(http_json.ExtractError):
        http_json.ingest_payload(spark, json.dumps({"nope": []}))


# --- load (S3) ------------------------------------------------------------

def test_load_success(spark, tmp_path):
    """Row persisted, count==1 (main_test.go:250-296)."""
    path = str(tmp_path / "vehicles")
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(1, speed=25.5)]), path)
    assert spark.read.parquet(path).count() == 1


def test_load_handles_duplicates(spark, tmp_path):
    """Same id re-loaded → 1 row, newest speed wins (main_test.go:299-359)."""
    path = str(tmp_path / "vehicles")
    later = NOW + datetime.timedelta(minutes=5)
    upsert_parquet(
        spark, _vehicles_df(spark, [_vehicle(1, vid="dup", speed=25.5)]), path
    )
    upsert_parquet(
        spark,
        _vehicles_df(spark, [_vehicle(1, vid="dup", speed=30.0, ingested=later)]),
        path,
    )
    out = spark.read.parquet(path).collect()
    assert len(out) == 1
    assert out[0]["speed"] == 30.0


def test_load_tie_prefers_incoming_batch(spark, tmp_path):
    """Equal ingested_at → REPLACE semantics: the new batch wins
    (reference load.go:14 always replaces)."""
    path = str(tmp_path / "vehicles")
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(1, vid="t", speed=1.0)]), path)
    upsert_parquet(spark, _vehicles_df(spark, [_vehicle(1, vid="t", speed=2.0)]), path)
    out = spark.read.parquet(path).collect()
    assert len(out) == 1 and out[0]["speed"] == 2.0


# --- vehicle queries ------------------------------------------------------

def test_top10_fastest(spark):
    """15 rows speeds 0..70 step 5 → 10 results sorted desc, max 70
    (main_test.go:362-421)."""
    df = _vehicles_df(spark, [_vehicle(i, speed=i * 5) for i in range(15)])
    out = vq.top10_fastest(df).collect()
    assert len(out) == 10
    speeds = [r["speed"] for r in out]
    assert speeds == sorted(speeds, reverse=True)
    assert speeds[0] == 70.0


def test_summary_stats(spark):
    """3 rows speeds 10/20/30 → avg 20, max 30 (main_test.go:424-495)."""
    df = _vehicles_df(spark, [_vehicle(i, speed=s) for i, s in enumerate([10, 20, 30])])
    row = vq.summary_stats(df).collect()[0]
    assert row["total_vehicles"] == 3
    assert row["average_speed"] == 20.0
    assert row["max_speed"] == 30.0
    assert row["moving_vehicles"] == 3
    assert row["percent_moving"] == 100.0
    # discrete percentiles, offsets n//2=1, 9n//10=2, 95n//100=2 → 20,30,30
    assert (row["p50"], row["p90"], row["p95"]) == (20.0, 30.0, 30.0)


def test_summary_stats_no_moving(spark):
    df = _vehicles_df(spark, [_vehicle(i, speed=0) for i in range(3)])
    row = vq.summary_stats(df).collect()[0]
    assert row["moving_vehicles"] == 0
    assert row["p50"] is None and row["p90"] is None and row["p95"] is None


def test_route_breakdown_dead_arm(spark):
    """'ynk...' ids classify as Bus — the reference's dead CASE arm
    (queries.go:31-32), preserved."""
    rows = [
        _vehicle(1, vid="R-123", speed=10),
        _vehicle(2, vid="O-1", speed=20),
        _vehicle(3, vid="G-2", speed=30),
        _vehicle(4, vid="B-9", speed=40),
        _vehicle(5, vid="y100", speed=50),
        _vehicle(6, vid="ynk-5", speed=60),
        _vehicle(7, vid="Z-0", speed=70),
    ]
    out = {r["route_type"]: r for r in vq.route_breakdown(_vehicles_df(spark, rows)).collect()}
    assert out["Bus"]["count"] == 2  # y100 AND ynk-5
    assert "Commuter Rail" not in out
    assert out["Other"]["count"] == 1


def test_bearing_between_no_wraparound(spark):
    """target=5 delta=10 → [-5,15]: excludes 355/359 (queries.go:189-198
    quirk replicated)."""
    rows = [_vehicle(i, bearing=b, vid=f"b{b}") for i, b in enumerate([0, 5, 15, 16, 355, 359])]
    out = vq.vehicles_by_bearing(_vehicles_df(spark, rows), 5, 10).collect()
    assert sorted(r["bearing"] for r in out) == [0, 5, 15]


def test_bearing_summary_buckets(spark):
    """Every 45° boundary + North wrap + 360 fallback + zero-filled buckets
    (queries.go:224-276, FIXTURES bearing set)."""
    bearings = [0, 5, 22, 23, 337, 338, 355, 359, 360, 90, 180]
    rows = [_vehicle(i, bearing=b, vid=f"c{i}") for i, b in enumerate(bearings)]
    out = {r["direction"]: r["cnt"] for r in vq.bearing_summary(_vehicles_df(spark, rows)).collect()}
    assert len(out) == 8  # all buckets materialized
    # North: 0,5,22,338,355,359,360 (>=337.5 or <22.5, plus 360 fallback)
    assert out["North"] == 7
    assert out["Northeast"] == 1  # 23
    assert out["Northwest"] == 1  # 337 (292.5<=337<337.5)
    assert out["East"] == 1  # 90
    assert out["South"] == 1  # 180
    assert out["Southeast"] == 0
    assert out["Southwest"] == 0
    assert out["West"] == 0


def test_point_lookup(spark):
    df = _vehicles_df(spark, [_vehicle(1, vid="A", speed=33.0)])
    out = vq.vehicle_speed(df, "A").collect()
    assert len(out) == 1 and out[0]["speed"] == 33.0
    assert vq.vehicle_speed(df, "missing").count() == 0
